"""RTP payloaders/depayloaders for coded media + RTP routing + DTMF.

References (gst-plugins-good/gst/rtp/ and gst/dtmf/, gst/rtpmanager/):
* rtppcmupay/rtppcmudepay, rtppcmapay/rtppcmadepay
  (gstrtppcmupay.c/gstrtppcmadepay.c...): RFC 3551 static payload
  types 0 (PCMU) and 8 (PCMA) at an 8 kHz clock, raw law bytes as
  payload, split at the MTU.
* rtph264pay/rtph264depay (gstrtph264pay.c/gstrtph264depay.c):
  RFC 6184 — single-NAL-unit packets when they fit the MTU, FU-A
  fragmentation (S/E bits in the FU header) otherwise; the depayloader
  also accepts STAP-A aggregates.  Output is byte-stream/au with the
  marker bit closing each access unit.
* rtpptdemux (gstrtpptdemux.c): routes packets to a src pad per
  payload type; rtpssrcdemux (gstrtpssrcdemux.c): per SSRC.
* rtpdtmfsrc (gst/dtmf/gstrtpdtmfsrc.c): RFC 4733 telephone-event
  packets — 4-byte event payload (event, E|R|volume, duration),
  timestamp frozen for the tone, redundant end packets;
  rtpdtmfdepay (gstrtpdtmfdepay.c): synthesizes the dual-sine tone
  back to S16 8 kHz audio from the event stream.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

import numpy as np

from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (PadDirection, PadPresence, PadTemplate,
                            SourceElement, TransformElement,
                            register_element)
from ..core.structure import Structure
from .rtp import parse_rtp_header, rtp_header


def _blobs(buf: Buffer) -> List[bytes]:
    d = buf.data
    if isinstance(d, (list, tuple)):
        return [bytes(x) if isinstance(x, (bytes, bytearray))
                else np.asarray(x).tobytes() for x in d]
    arr = np.asarray(d)
    if arr.ndim > 1:
        return [bytes(r.tobytes()) for r in arr]
    return [bytes(arr.tobytes())]


# ---------------------------------------------------------------------------
# PCMU / PCMA (RFC 3551)
# ---------------------------------------------------------------------------

class _LawPayBase(TransformElement):
    HOST_ELEMENT = True
    _MEDIA = ""
    _PT = 0
    PROPERTIES = {
        "mtu": (int, 1400, "max packet size"),
        "pt": (int, -1, "payload type (-1 = static default)"),
        "ssrc": (int, 0x1234, ""),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._seq = 0

    def transform_caps(self, direction, caps, filter=None):
        res = (Caps.from_string("application/x-rtp")
               if direction == PadDirection.SINK
               else self.sink_pads()[0].template_caps)
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        self._seq = 0

    def host_process(self, buf: Optional[Buffer]) -> Optional[Buffer]:
        if buf is None:
            return None
        raw = b"".join(_blobs(buf))
        pt = self.props["pt"] if self.props["pt"] >= 0 else self._PT
        room = self.props["mtu"] - 12
        ts = ((buf.pts or 0) * 8000) // 1_000_000_000
        pkts = []
        for off in range(0, len(raw), room):
            chunk = raw[off:off + room]
            pkts.append(rtp_header(pt, self._seq, ts + off,
                                   self.props["ssrc"]) + chunk)
            self._seq = (self._seq + 1) & 0xFFFF
        return buf.with_(data=pkts)


class _LawDepayBase(TransformElement):
    HOST_ELEMENT = True
    _MEDIA = ""

    def transform_caps(self, direction, caps, filter=None):
        res = (Caps.from_string(
            f"{self._MEDIA}, rate=8000, channels=1")
            if direction == PadDirection.SINK
            else Caps.from_string("application/x-rtp"))
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        pass

    def host_process(self, buf: Optional[Buffer]) -> Optional[Buffer]:
        if buf is None:
            return None
        out = []
        pts = None
        for pkt in _blobs(buf):
            h = parse_rtp_header(pkt)
            if pts is None:
                pts = h["timestamp"] * 1_000_000_000 // 8000
            out.append(np.frombuffer(h["payload"], np.uint8))
        if not out:
            return None
        samples = np.concatenate(out).reshape(-1, 1)
        return buf.with_(data=samples, pts=pts,
                         duration=samples.shape[0] * 1_000_000_000
                         // 8000)


@register_element
class RtpPcmuPay(_LawPayBase):
    FACTORY = "rtppcmupay"
    DESCRIPTION = "Payload-encodes PCMU audio into a RTP packet"
    _MEDIA, _PT = "audio/x-mulaw", 0
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK,
                    "audio/x-mulaw, rate=8000, channels=1"),
        PadTemplate("src", PadDirection.SRC, "application/x-rtp"),
    ]


@register_element
class RtpPcmuDepay(_LawDepayBase):
    FACTORY = "rtppcmudepay"
    DESCRIPTION = "Extracts PCMU audio from RTP packets"
    _MEDIA = "audio/x-mulaw"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, "application/x-rtp"),
        PadTemplate("src", PadDirection.SRC,
                    "audio/x-mulaw, rate=8000, channels=1"),
    ]


@register_element
class RtpPcmaPay(_LawPayBase):
    FACTORY = "rtppcmapay"
    DESCRIPTION = "Payload-encodes PCMA audio into a RTP packet"
    _MEDIA, _PT = "audio/x-alaw", 8
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK,
                    "audio/x-alaw, rate=8000, channels=1"),
        PadTemplate("src", PadDirection.SRC, "application/x-rtp"),
    ]


@register_element
class RtpPcmaDepay(_LawDepayBase):
    FACTORY = "rtppcmadepay"
    DESCRIPTION = "Extracts PCMA audio from RTP packets"
    _MEDIA = "audio/x-alaw"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, "application/x-rtp"),
        PadTemplate("src", PadDirection.SRC,
                    "audio/x-alaw, rate=8000, channels=1"),
    ]


# ---------------------------------------------------------------------------
# H.264 (RFC 6184)
# ---------------------------------------------------------------------------

def _split_annexb(raw: bytes) -> List[bytes]:
    out = []
    pos = 0
    while True:
        i = raw.find(b"\x00\x00\x01", pos)
        if i < 0:
            return out
        j = raw.find(b"\x00\x00\x01", i + 3)
        end = len(raw) if j < 0 else j - (1 if raw[j - 1] == 0 else 0)
        if end > i + 3:
            out.append(raw[i + 3:end])
        pos = i + 3
    return out


@register_element
class RtpH264Pay(TransformElement):
    FACTORY = "rtph264pay"
    DESCRIPTION = "Payload-encode H264 video into RTP packets " \
                  "(RFC 6184)"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK,
                    "video/x-h264, stream-format=byte-stream, "
                    "alignment=au"),
        PadTemplate("src", PadDirection.SRC, "application/x-rtp"),
    ]
    PROPERTIES = {
        "mtu": (int, 1400, "max packet size"),
        "pt": (int, 96, "payload type"),
        "ssrc": (int, 0x64646464, ""),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._seq = 0

    def transform_caps(self, direction, caps, filter=None):
        res = (Caps.from_string("application/x-rtp")
               if direction == PadDirection.SINK
               else self.sink_pads()[0].template_caps)
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        self._seq = 0

    def _pkt(self, payload: bytes, ts: int, marker: bool) -> bytes:
        hdr = rtp_header(self.props["pt"], self._seq, ts,
                         self.props["ssrc"], marker=marker)
        self._seq = (self._seq + 1) & 0xFFFF
        return hdr + payload

    def _pay_au(self, au: bytes, ts: int) -> List[bytes]:
        room = self.props["mtu"] - 12
        nals = _split_annexb(au)
        pkts = []
        for n, nal in enumerate(nals):
            last_nal = n == len(nals) - 1
            if len(nal) <= room:
                pkts.append(self._pkt(nal, ts, last_nal))
                continue
            # FU-A (RFC 6184 5.8): indicator keeps F/NRI, type 28
            indicator = (nal[0] & 0xE0) | 28
            ntype = nal[0] & 0x1F
            body = nal[1:]
            off = 0
            while off < len(body):
                take = min(room - 2, len(body) - off)
                start = off == 0
                end = off + take >= len(body)
                fu_hdr = (0x80 if start else 0) | (0x40 if end else 0) \
                    | ntype
                pkts.append(self._pkt(
                    bytes([indicator, fu_hdr]) + body[off:off + take],
                    ts, last_nal and end))
                off += take
        return pkts

    def host_process(self, buf: Optional[Buffer]) -> Optional[Buffer]:
        if buf is None:
            return None
        ts0 = buf.pts or 0
        dur = buf.duration or 0
        pkts = []
        for k, au in enumerate(_blobs(buf)):
            ts90 = ((ts0 + k * dur) * 90000) // 1_000_000_000
            pkts.extend(self._pay_au(au, ts90))
        return buf.with_(data=pkts)


@register_element
class RtpH264Depay(TransformElement):
    FACTORY = "rtph264depay"
    DESCRIPTION = "Extracts H264 video from RTP packets (RFC 6184)"
    HOST_ELEMENT = True
    _decouple = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, "application/x-rtp"),
        PadTemplate("src", PadDirection.SRC,
                    "video/x-h264, stream-format=byte-stream, "
                    "alignment=au"),
    ]

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._au = bytearray()
        self._fu = bytearray()

    def transform_caps(self, direction, caps, filter=None):
        res = (Caps.from_string(
            "video/x-h264, stream-format=byte-stream, alignment=au")
            if direction == PadDirection.SINK
            else Caps.from_string("application/x-rtp"))
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        self._au = bytearray()
        self._fu = bytearray()

    @property
    def _pending_buf(self):
        return True if self._au else None

    def _push_nal(self, nal: bytes) -> None:
        self._au += b"\x00\x00\x00\x01" + nal

    def host_process(self, buf: Optional[Buffer]) -> Optional[Buffer]:
        if buf is None:                          # EOS drain
            if not self._au:
                return None
            au = bytes(self._au)
            self._au = bytearray()
            return Buffer(data=np.frombuffer(au, np.uint8), batch=1)
        aus = []
        pts = buf.pts
        for pkt in _blobs(buf):
            h = parse_rtp_header(pkt)
            payload = h["payload"]
            if not payload:
                continue
            ntype = payload[0] & 0x1F
            if ntype == 28:                      # FU-A
                fu = payload[1]
                if fu & 0x80:                    # start
                    self._fu = bytearray(
                        [(payload[0] & 0xE0) | (fu & 0x1F)])
                self._fu += payload[2:]
                if fu & 0x40:                    # end
                    self._push_nal(bytes(self._fu))
                    self._fu = bytearray()
            elif ntype == 24:                    # STAP-A
                p = 1
                while p + 2 <= len(payload):
                    ln = struct.unpack(">H", payload[p:p + 2])[0]
                    self._push_nal(payload[p + 2:p + 2 + ln])
                    p += 2 + ln
            elif 1 <= ntype <= 23:
                self._push_nal(payload)
            if h["marker"] and self._au:
                aus.append(bytes(self._au))
                self._au = bytearray()
        if not aus:
            return None
        data = [np.frombuffer(a, np.uint8) for a in aus]
        return buf.with_(data=data if len(data) > 1 else data[0],
                         pts=pts, batch=len(data))


# ---------------------------------------------------------------------------
# rtpptdemux / rtpssrcdemux (gstrtpmanager)
# ---------------------------------------------------------------------------

class _RtpDemuxBase(TransformElement):
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, "application/x-rtp"),
        PadTemplate("src_%u", PadDirection.SRC, "application/x-rtp",
                    PadPresence.REQUEST),
    ]

    def _key(self, hdr: dict) -> int:
        raise NotImplementedError

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._keys: List[int] = []

    def start(self):
        self._keys = []

    def host_process(self, buf: Optional[Buffer]) -> Optional[Buffer]:
        return buf

    def route_outputs(self, buf: Buffer) -> Dict[str, Buffer]:
        groups: Dict[int, List[bytes]] = {}
        for pkt in _blobs(buf):
            h = parse_rtp_header(pkt)
            groups.setdefault(self._key(h), []).append(pkt)
        out = {}
        pads = self.src_pads()
        for key, pkts in groups.items():
            if key not in self._keys:
                self._keys.append(key)
            idx = self._keys.index(key)
            if idx < len(pads):
                out[pads[idx].name] = buf.with_(
                    data=pkts, meta=dict(buf.meta or {},
                                         rtp_key=key))
        return out


@register_element
class RtpPtDemux(_RtpDemuxBase):
    FACTORY = "rtpptdemux"
    DESCRIPTION = "Parses codec streams transmitted in the same RTP " \
                  "session"

    def _key(self, hdr: dict) -> int:
        return hdr["payload_type"]


@register_element
class RtpSsrcDemux(_RtpDemuxBase):
    FACTORY = "rtpssrcdemux"
    DESCRIPTION = "Splits RTP streams based on the SSRC"

    def _key(self, hdr: dict) -> int:
        return hdr["ssrc"]


# ---------------------------------------------------------------------------
# DTMF over RTP (RFC 4733)
# ---------------------------------------------------------------------------

_DTMF_EVENTS = "0123456789*#ABCD"


@register_element
class RtpDtmfSrc(SourceElement):
    """rtpdtmfsrc: telephone-event packets for a key sequence.  The
    reference is driven by dtmf-event upstream events; here the
    `tones` property mirrors our dtmfsrc."""
    FACTORY = "rtpdtmfsrc"
    DESCRIPTION = "Generates RTP DTMF packets"
    PAD_TEMPLATES = [PadTemplate(
        "src", PadDirection.SRC,
        "application/x-rtp, media=audio, encoding-name=TELEPHONE-EVENT")]
    PROPERTIES = {
        "tones": (str, "", "key sequence, e.g. '123#'"),
        "tone-duration": (int, 250, "per-tone ms"),
        "volume": (int, 0, "attenuation in dBm0"),
        "pt": (int, 96, "payload type"),
        "ssrc": (int, 0x44544D46, ""),
        "packet-interval": (int, 50, "ms between event packets"),
        "packet-redundancy": (int, 3, "end-packet retransmits "
                                      "(gstrtpdtmfsrc.c)"),
    }
    RATE = 8000

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._packets: Optional[List[bytes]] = None
        self._pos = 0

    def get_caps(self, filter=None):
        caps = self.src_pads()[0].template_caps
        if filter is not None:
            caps = caps.intersect(filter)
        return caps

    def _event_payload(self, event: int, end: bool,
                       duration: int) -> bytes:
        b1 = (0x80 if end else 0) | (self.props["volume"] & 0x3F)
        return struct.pack("!BBH", event, b1, duration & 0xFFFF)

    def _build(self) -> List[bytes]:
        pkts = []
        seq = 0
        ts = 0
        interval = self.props["packet-interval"]
        dur_ms = self.props["tone-duration"]
        for c in self.props["tones"].upper():
            if c not in _DTMF_EVENTS:
                continue
            event = _DTMF_EVENTS.index(c)
            # ts frozen for the duration of the event (RFC 4733 2.5.1.2)
            first = True
            elapsed = interval
            while elapsed < dur_ms:
                pkts.append(rtp_header(self.props["pt"], seq, ts,
                                       self.props["ssrc"],
                                       marker=first)
                            + self._event_payload(
                                event, False, elapsed * 8))
                seq = (seq + 1) & 0xFFFF
                first = False
                elapsed += interval
            for _ in range(self.props["packet-redundancy"]):
                pkts.append(rtp_header(self.props["pt"], seq, ts,
                                       self.props["ssrc"],
                                       marker=first)
                            + self._event_payload(
                                event, True, dur_ms * 8))
                seq = (seq + 1) & 0xFFFF
                first = False
            ts += dur_ms * 8
        return pkts

    def start(self):
        self._packets = self._build()
        self._pos = 0

    def create(self, n_frames: int) -> Optional[Buffer]:
        if self._pos >= len(self._packets):
            return None
        take = self._packets[self._pos:self._pos + max(1, n_frames) * 4]
        self._pos += len(take)
        # arrays (not bytes) so fully-fused pipelines can carry them
        return Buffer(data=[np.frombuffer(p, np.uint8) for p in take],
                      batch=len(take))


@register_element
class RtpDtmfDepay(TransformElement):
    """rtpdtmfdepay: RFC 4733 events -> synthesized S16 8 kHz tone
    audio (gstrtpdtmfdepay.c generates the dual sine per event)."""
    FACTORY = "rtpdtmfdepay"
    DESCRIPTION = "Generates DTMF sound from telephone-event RTP " \
                  "packets"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, "application/x-rtp"),
        PadTemplate("src", PadDirection.SRC,
                    "audio/x-raw, format=S16LE, rate=8000, channels=1, "
                    "layout=interleaved"),
    ]

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._done: Dict[int, int] = {}          # ts -> samples emitted

    def transform_caps(self, direction, caps, filter=None):
        res = (Caps.from_string(
            "audio/x-raw, format=S16LE, rate=8000, channels=1, "
            "layout=interleaved")
            if direction == PadDirection.SINK
            else Caps.from_string("application/x-rtp"))
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        self._done = {}

    def host_process(self, buf: Optional[Buffer]) -> Optional[Buffer]:
        if buf is None:
            return None
        from ..elements.dtmf_icy import generate_dtmf
        out = []
        for pkt in _blobs(buf):
            h = parse_rtp_header(pkt)
            p = h["payload"]
            if len(p) < 4:
                continue
            event, b1, dur = struct.unpack("!BBH", p[:4])
            if event >= len(_DTMF_EVENTS):
                continue
            volume = b1 & 0x3F
            ts = h["timestamp"]
            emitted = self._done.get(ts, 0)
            if dur <= emitted:
                continue                         # redundant end packet
            key = _DTMF_EVENTS[event]
            out.append(generate_dtmf(key, dur - emitted, 8000,
                                     volume, start_sample=emitted))
            self._done[ts] = dur
        if not out:
            return None
        samples = np.concatenate(out).reshape(-1, 1)
        return buf.with_(data=samples,
                         duration=samples.shape[0] * 1_000_000_000
                         // 8000)
