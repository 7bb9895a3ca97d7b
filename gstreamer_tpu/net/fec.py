"""SMPTE 2022-1 forward error correction for RTP streams.

Reference: gst-plugins-bad/gst/rtp/gstrtpst2022-1-fecenc.c and
gstrtpst2022-1-fecdec.c (RFC 2733-based XOR FEC with the ST 2022-1
restrictions: 1-D row/column protection, E=1 extension header).

rtpst2022_1_fecenc: after every L media packets, emits one FEC packet
whose payload is the XOR of the L payloads (padded), with recovery
fields for PT/timestamp/length; SN base + NA identify the protected
run.  rtpst2022_1_fecdec: caches media + FEC packets and rebuilds any
single missing packet per row by XOR-ing the FEC payload with the
received packets.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

import numpy as np

from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)
from .rtp import parse_rtp_header, rtp_header


def _xor_bytes(a: bytes, b: bytes) -> bytes:
    n = max(len(a), len(b))
    x = np.frombuffer(a.ljust(n, b"\x00"), np.uint8) \
        ^ np.frombuffer(b.ljust(n, b"\x00"), np.uint8)
    return x.tobytes()


def build_fec_packet(media: List[bytes], fec_pt: int, fec_seq: int,
                     fec_ssrc: int) -> bytes:
    """One ST 2022-1 FEC packet protecting the given media packets
    (one row: offset 1, NA = len(media))."""
    hdrs = [parse_rtp_header(p) for p in media]
    sn_base = hdrs[0]["seq"]
    pt_rec = 0
    m_rec = 0
    ts_rec = 0
    len_rec = 0
    payload_xor = b""
    for h, p in zip(hdrs, media):
        pt_rec ^= h["payload_type"]
        m_rec ^= 1 if h["marker"] else 0
        ts_rec ^= h["timestamp"]
        len_rec ^= len(h["payload"])
        payload_xor = _xor_bytes(payload_xor, h["payload"])
    # RFC 2733 FEC header with the ST 2022-1 E=1 extension:
    # SNBase(16) lenRec(16) E|PTrec(8) mask(24) TSrec(32)
    # X|D|type(3)|index(3) offset(8) NA(8) SNBase-ext(8)
    # (marker recovery rides bit 7 of the otherwise-zero SNBase-ext
    # byte — RFC 2733's E bit displaces M in the PT-recovery byte)
    fec_hdr = struct.pack(
        ">HHB3sI", sn_base & 0xFFFF, len_rec & 0xFFFF,
        0x80 | (pt_rec & 0x7F), b"\x00\x00\x00",
        ts_rec & 0xFFFFFFFF)
    fec_hdr += struct.pack(">BBBB", 0x00, 1, len(media),
                           0x80 if m_rec else 0x00)
    ts = hdrs[-1]["timestamp"]
    return rtp_header(fec_pt, fec_seq, ts, fec_ssrc) \
        + fec_hdr + payload_xor


def parse_fec_packet(pkt: bytes) -> Optional[dict]:
    h = parse_rtp_header(pkt)
    body = h["payload"]
    if len(body) < 14:
        return None
    sn_base, len_rec, e_pt = struct.unpack(">HHB", body[:5])
    ts_rec = struct.unpack(">I", body[8:12])[0]
    offset, na = body[13], body[14] if len(body) > 14 else 0
    m_rec = bool(body[15] & 0x80) if len(body) > 15 else False
    return {"sn_base": sn_base, "len_rec": len_rec,
            "pt_rec": e_pt & 0x7F, "m_rec": m_rec, "ts_rec": ts_rec,
            "offset": max(offset, 1), "na": na,
            "payload_xor": body[16:], "seq": h["seq"]}


@register_element
class RtpSt2022FecEnc(TransformElement):
    FACTORY = "rtpst2022_1_fecenc"
    DESCRIPTION = "SMPTE 2022-1 FEC encoder"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, "application/x-rtp"),
        PadTemplate("src", PadDirection.SRC, "application/x-rtp"),
    ]
    PROPERTIES = {
        "rows": (int, 5, "packets per FEC row (L)"),
        "pt": (int, 100, "FEC payload type"),
        "ssrc": (int, 0xFEC0FEC0, "FEC stream SSRC"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._row: List[bytes] = []
        self._fec_seq = 0

    def transform_caps(self, direction, caps, filter=None):
        res = Caps.from_string("application/x-rtp")
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        self._row = []
        self._fec_seq = 0

    def host_process(self, buf: Optional[Buffer]) -> Optional[Buffer]:
        if buf is None:
            return None
        pkts = buf.data if isinstance(buf.data, list) else [buf.data]
        out = []
        for p in pkts:
            raw = (bytes(p) if isinstance(p, (bytes, bytearray))
                   else np.asarray(p).tobytes())
            out.append(raw)
            self._row.append(raw)
            if len(self._row) >= self.props["rows"]:
                out.append(build_fec_packet(
                    self._row, self.props["pt"], self._fec_seq,
                    self.props["ssrc"]))
                self._fec_seq = (self._fec_seq + 1) & 0xFFFF
                self._row = []
        return buf.with_(data=out)


@register_element
class RtpSt2022FecDec(TransformElement):
    FACTORY = "rtpst2022_1_fecdec"
    DESCRIPTION = "SMPTE 2022-1 FEC decoder"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, "application/x-rtp"),
        PadTemplate("src", PadDirection.SRC, "application/x-rtp"),
    ]
    PROPERTIES = {
        "pt": (int, 100, "FEC payload type"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._media: Dict[int, bytes] = {}
        self.recovered = 0

    def transform_caps(self, direction, caps, filter=None):
        res = Caps.from_string("application/x-rtp")
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        self._media = {}
        self.recovered = 0

    def _recover(self, fec: dict) -> Optional[bytes]:
        run = [(fec["sn_base"] + i * fec["offset"]) & 0xFFFF
               for i in range(fec["na"])]
        missing = [s for s in run if s not in self._media]
        if len(missing) != 1:
            return None
        pay = fec["payload_xor"]
        pt = fec["pt_rec"]
        marker = 1 if fec["m_rec"] else 0
        ts = fec["ts_rec"]
        length = fec["len_rec"]
        for s in run:
            if s in self._media:
                h = parse_rtp_header(self._media[s])
                pay = _xor_bytes(pay, h["payload"])
                pt ^= h["payload_type"]
                marker ^= 1 if h["marker"] else 0
                ts ^= h["timestamp"]
                length ^= len(h["payload"])
        pay = pay[:length]
        self.recovered += 1
        return rtp_header(pt, missing[0], ts,
                          parse_rtp_header(
                              next(iter(self._media.values())))["ssrc"],
                          marker=bool(marker)) + pay

    def host_process(self, buf: Optional[Buffer]) -> Optional[Buffer]:
        if buf is None:
            return None
        pkts = buf.data if isinstance(buf.data, list) else [buf.data]
        fecs = []
        for p in pkts:
            raw = (bytes(p) if isinstance(p, (bytes, bytearray))
                   else np.asarray(p).tobytes())
            h = parse_rtp_header(raw)
            if h["payload_type"] == self.props["pt"]:
                f = parse_fec_packet(raw)
                if f is not None:
                    fecs.append(f)
            else:
                self._media[h["seq"]] = raw
        for f in fecs:
            rec = self._recover(f)
            if rec is not None:
                self._media[parse_rtp_header(rec)["seq"]] = rec
        out = [self._media[k] for k in sorted(self._media)]
        self._media = {}
        if not out:
            return None
        return buf.with_(data=out)
