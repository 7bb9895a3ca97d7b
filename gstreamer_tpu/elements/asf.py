"""ASF (Advanced Systems Format) — asfmux / asfparse, reduced.

References: gst-plugins-bad/gst/asfmux/ — gstasfmux.c (header/
stream-properties/data-object writing), gstasfobjects.c:24-57 (the
Microsoft-registered object GUIDs), gstasfparse.c (object walk).

Reduced profile:
* Header Object (File Properties + one Stream Properties per
  stream + Content Description), Data Object with one payload per
  ASF data packet using the single-payload parsing layout
  (gstasfmux.c gst_asf_mux_write_data_object / payload headers);
* audio: PCM S16LE via WAVEFORMATEX tag 1; video: MJPEG via
  BITMAPINFOHEADER fourcc MJPG (the codecs the framework produces
  natively).  Simple Index and bitrate-mutex objects are not
  written (documented).
"""

from __future__ import annotations

import struct
import uuid
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..audio import format as afmt
from ..audio.info import AudioInfo
from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (AggregatorElement, PadDirection,
                            PadPresence, PadTemplate, SourceElement,
                            register_element)
from ..core.value import Fraction


def _guid(a: int, b: int, c: int, rest: int) -> bytes:
    """Guid struct (gstasfobjects.c): LE dword/word/word + BE tail."""
    return struct.pack("<IHH", a, b, c) + rest.to_bytes(8, "big")


GUID_HEADER = _guid(0x75B22630, 0x668E, 0x11CF, 0xA6D900AA0062CE6C)
GUID_FILE_PROPS = _guid(0x8CABDCA1, 0xA947, 0x11CF,
                        0x8EE400C00C205365)
GUID_STREAM_PROPS = _guid(0xB7DC0791, 0xA9B7, 0x11CF,
                          0x8EE600C00C205365)
GUID_AUDIO_MEDIA = _guid(0xF8699E40, 0x5B4D, 0x11CF,
                         0xA8FD00805F5C442B)
GUID_VIDEO_MEDIA = _guid(0xBC19EFC0, 0x5B4D, 0x11CF,
                         0xA8FD00805F5C442B)
GUID_NO_ERROR_CORRECTION = _guid(0x20FB5700, 0x5B55, 0x11CF,
                                 0xA8FD00805F5C442B)
GUID_DATA = _guid(0x75B22636, 0x668E, 0x11CF, 0xA6D900AA0062CE6C)
GUID_CONTENT_DESC = _guid(0x75B22633, 0x668E, 0x11CF,
                          0xA6D900AA0062CE6C)


def _obj(guid: bytes, payload: bytes) -> bytes:
    return guid + struct.pack("<Q", 24 + len(payload)) + payload


@register_element
class AsfMux(AggregatorElement):
    FACTORY = "asfmux"
    DESCRIPTION = "Muxes audio and video into an ASF stream"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("video_%u", PadDirection.SINK, "image/jpeg",
                    presence=PadPresence.REQUEST),
        PadTemplate("audio_%u", PadDirection.SINK,
                    "audio/x-raw, format=S16LE, layout=interleaved",
                    presence=PadPresence.REQUEST),
        PadTemplate("src", PadDirection.SRC, "video/x-ms-asf"),
    ]
    PROPERTIES = {"location": (str, "out.asf", "output path")}

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._ainfo: Optional[AudioInfo] = None
        self._vdims = None                   # (w, h, fps)
        self._file = None
        self._payloads: List[Tuple[int, int, bytes]] = []

    def negotiate_output(self, in_caps, allowed):
        for pad_name, caps in in_caps.items():
            s = caps.fixate()[0]
            if pad_name.startswith("video"):
                fps = s.get("framerate") or Fraction(25, 1)
                self._vdims = (s.get("width") or 0,
                               s.get("height") or 0, fps)
            else:
                self._ainfo = AudioInfo.from_caps_structure(s)
        return Caps.from_string("video/x-ms-asf")

    def start(self):
        self._file = open(self.props["location"], "wb")
        self._payloads = []

    def host_aggregate(self, ins: Dict[str, Buffer]) -> Optional[Buffer]:
        for pad_name in sorted(ins):
            buf = ins[pad_name]
            ms = (buf.pts or 0) // 1_000_000
            if pad_name.startswith("video"):
                d = buf.data
                blobs = d if isinstance(d, (list, tuple)) else [d]
                dur_ms = (buf.duration or 0) // 1_000_000
                for k, b in enumerate(blobs):
                    raw = (bytes(b) if isinstance(b,
                                                  (bytes, bytearray))
                           else np.asarray(b).tobytes())
                    self._payloads.append((2, ms + k * dur_ms, raw))
            else:
                raw = afmt.to_bytes(self._ainfo.finfo,
                                    np.asarray(buf.data)).tobytes()
                self._payloads.append((1, ms, raw))
        first = next(iter(ins.values()))
        return first.with_(data=np.zeros(1, np.uint8))

    def _stream_props_audio(self, snum: int) -> bytes:
        ai = self._ainfo
        ba = 2 * ai.channels
        wfx = struct.pack("<HHIIHH", 1, ai.channels, ai.rate,
                          ai.rate * ba, ba, 16) + struct.pack("<H", 0)
        body = GUID_AUDIO_MEDIA + GUID_NO_ERROR_CORRECTION
        body += struct.pack("<QIIHI", 0, len(wfx), 0, snum, 0)
        body += wfx
        return _obj(GUID_STREAM_PROPS, body)

    def _stream_props_video(self, snum: int) -> bytes:
        w, h, _fps = self._vdims
        bmih = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                           0, 0, 0, 0, 0)
        vinfo = struct.pack("<IIBH", w, h, 2, len(bmih)) + bmih
        body = GUID_VIDEO_MEDIA + GUID_NO_ERROR_CORRECTION
        body += struct.pack("<QIIHI", 0, len(vinfo), 0, snum, 0)
        body += vinfo
        return _obj(GUID_STREAM_PROPS, body)

    def stop(self):
        if self._file is None:
            return
        file_id = uuid.uuid4().bytes
        streams = []
        if self._ainfo is not None:
            streams.append(self._stream_props_audio(1))
        if self._vdims is not None:
            streams.append(self._stream_props_video(2))
        # data packets: one payload each (reduced single-payload
        # packet: stream(2) send-time(4) size(4) data)
        packets = b""
        for snum, ms, raw in self._payloads:
            packets += struct.pack("<HII", snum, ms, len(raw)) + raw
        dur_ms = max((ms for _, ms, _ in self._payloads), default=0)
        play_dur = (dur_ms + 1000) * 10_000      # 100ns units
        fileprops_body = file_id + struct.pack(
            "<QQQQQQIII", 0, 0, len(self._payloads), play_dur,
            play_dur, 0, 0x02, 0, 0)
        fileprops = _obj(GUID_FILE_PROPS, fileprops_body)
        title = "gstreamer_tpu asfmux".encode("utf-16-le") + b"\0\0"
        cdesc = _obj(GUID_CONTENT_DESC,
                     struct.pack("<HHHHH", len(title), 0, 0, 0, 0)
                     + title)
        children = fileprops + b"".join(streams) + cdesc
        header = GUID_HEADER + struct.pack(
            "<QIBB", 24 + 6 + len(children), 2 + len(streams) + 1,
            0x01, 0x02) + children
        data_obj = GUID_DATA + struct.pack("<Q", 24 + 26
                                           + len(packets))
        data_obj += file_id + struct.pack("<QH",
                                          len(self._payloads), 0x0101)
        data_obj += packets
        # patch total file size into file properties
        total = len(header) + len(data_obj)
        fileprops_body = file_id + struct.pack(
            "<QQQQQQIII", total, 0, len(self._payloads), play_dur,
            play_dur, 0, 0x02, 0, 0)
        fileprops = _obj(GUID_FILE_PROPS, fileprops_body)
        children = fileprops + b"".join(streams) + cdesc
        header = GUID_HEADER + struct.pack(
            "<QIBB", 24 + 6 + len(children), 2 + len(streams) + 1,
            0x01, 0x02) + children
        self._file.write(header)
        self._file.write(data_obj)
        self._file.close()
        self._file = None


def _parse_asf(path: str):
    with open(path, "rb") as f:
        data = f.read()
    if data[:16] != GUID_HEADER:
        raise ValueError("asfparse: not an ASF file")
    hdr_size = struct.unpack("<Q", data[16:24])[0]
    nobj = struct.unpack("<I", data[24:28])[0]
    pos = 30
    streams = {}
    for _ in range(nobj):
        guid = data[pos:pos + 16]
        size = struct.unpack("<Q", data[pos + 16:pos + 24])[0]
        body = data[pos + 24:pos + size]
        if guid == GUID_STREAM_PROPS:
            stype = body[:16]
            tlen = struct.unpack("<I", body[40:44])[0]
            snum = struct.unpack("<H", body[48:50])[0] & 0x7F
            tdata = body[54:54 + tlen]
            if stype == GUID_AUDIO_MEDIA:
                tag, ch, rate = struct.unpack("<HHI", tdata[:8])
                streams[snum] = {"kind": "audio", "channels": ch,
                                 "rate": rate}
            elif stype == GUID_VIDEO_MEDIA:
                w, h = struct.unpack("<II", tdata[:8])
                streams[snum] = {"kind": "video", "width": w,
                                 "height": h}
        pos += size
    # data object
    pos = hdr_size
    if data[pos:pos + 16] != GUID_DATA:
        raise ValueError("asfparse: no data object")
    npkts = struct.unpack("<Q", data[pos + 40:pos + 48])[0]
    p = pos + 50
    payloads = []
    for _ in range(npkts):
        snum, ms, size = struct.unpack("<HII", data[p:p + 10])
        payloads.append((snum, ms, data[p + 10:p + 10 + size]))
        p += 10 + size
    return streams, payloads


@register_element
class AsfParse(SourceElement):
    """asfparse/asfdemux (reduced source-style): one stream per
    instance from a muxed .asf file."""
    FACTORY = "asfparse"
    DESCRIPTION = "Parses ASF"
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC, Caps.any())]
    PROPERTIES = {
        "location": (str, "", "asf file path"),
        "stream": (str, "video", "video | audio"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._loaded = False
        self._pos = 0

    def _load(self):
        if self._loaded:
            return
        streams, payloads = _parse_asf(self.props["location"])
        sel = self.props["stream"]
        snum = None
        for num, info in streams.items():
            if info["kind"] == sel:
                snum = num
                self._sinfo = info
                break
        if snum is None:
            raise ValueError(f"asfparse: no {sel!r} stream")
        self._payloads = [(ms, raw) for n, ms, raw in payloads
                          if n == snum]
        self._loaded = True

    def get_caps(self, filter=None):
        if self.props["location"]:
            try:
                self._load()
            except (OSError, ValueError):
                return Caps.any()
        if not self._loaded:
            caps = Caps.any()
        elif self._sinfo["kind"] == "video":
            from ..core.structure import Structure
            w, h = self._sinfo["width"], self._sinfo["height"]
            if (not w or not h) and self._payloads:
                # upstream caps had no dims: read them from the first
                # JPEG SOF (like gstasfdemux's stream activation)
                from .jpegformat import parse_sof, walk_markers
                markers, _, _ = walk_markers(self._payloads[0][1])
                for m, _off, payload in markers:
                    if m in (0xC0, 0xC1, 0xC2):
                        sof = parse_sof(payload)
                        w, h = sof["width"], sof["height"]
                        break
            caps = Caps([Structure("image/jpeg",
                                   {"width": w, "height": h})])
        else:
            caps = Caps([AudioInfo(
                format="S16LE", rate=self._sinfo["rate"],
                channels=self._sinfo["channels"])
                .to_caps_structure()])
        if filter is not None and not caps.is_any:
            caps = caps.intersect(filter)
        return caps

    def preview_blob(self) -> Optional[bytes]:
        try:
            self._load()
        except (OSError, ValueError):
            return None
        if self._sinfo["kind"] == "video" and self._payloads:
            return self._payloads[0][1]
        return None

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        self._load()
        self._pos = 0

    def create(self, n_frames: int) -> Optional[Buffer]:
        if self._pos >= len(self._payloads):
            return None
        if self._sinfo["kind"] == "video":
            take = self._payloads[self._pos:
                                  self._pos + max(1, n_frames)]
            self._pos += len(take)
            blobs = [np.frombuffer(raw, np.uint8) for _, raw in take]
            return Buffer(data=blobs if len(blobs) > 1 else blobs[0],
                          pts=take[0][0] * 1_000_000,
                          batch=len(blobs))
        ms, raw = self._payloads[self._pos]
        self._pos += 1
        samples = afmt.from_bytes(
            AudioInfo(format="S16LE", rate=self._sinfo["rate"],
                      channels=self._sinfo["channels"]).finfo,
            np.frombuffer(raw, np.uint8), self._sinfo["channels"])
        return Buffer(data=samples, pts=ms * 1_000_000, batch=1)


@register_element
class AsfDemux(AsfParse):
    """asfdemux — the gst-plugins-ugly/gst/asfdemux element name for
    the same reduced ASF reader (gstasfdemux.c)."""
    FACTORY = "asfdemux"
