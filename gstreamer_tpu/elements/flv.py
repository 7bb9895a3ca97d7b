"""flvmux / flvdemux — Adobe FLV container (audio family).

Port of gst-plugins-good/gst/flv/ scoped to the codecs this framework
ships: FLV carries no raw video codec, so like the reference's caps
table (gstflvdemux.c:63-70) the raw-capable audio side is implemented:
* sound format 3 = PCM little-endian (U8/S16LE),
  7 = G.711 A-law, 8 = G.711 mu-law (8 kHz);
* audio tag header byte = format<<4 | rate_code<<2 | size_bit<<1 |
  stereo_bit with rate codes {5512:0, 11025:1, 22050:2, 44100:3};
* file layout: "FLV" 0x01 flags(audio=0x04) dataoffset(9) then
  back-pointer-framed tags (type 8 audio / 18 script), 24-bit sizes,
  split 24+8-bit timestamps.
"""

from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np

from ..audio.info import AudioInfo
from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, SinkElement,
                            SourceElement, register_element)

_SINK_CAPS = ("audio/x-raw, format={ U8, S16LE }, "
              "rate={ 5512, 11025, 22050, 44100 }, channels=[1,2], "
              "layout=interleaved; "
              "audio/x-mulaw, rate=8000, channels=[1,2]; "
              "audio/x-alaw, rate=8000, channels=[1,2]")

_RATE_CODE = {5512: 0, 11025: 1, 22050: 2, 44100: 3}
_CODE_RATE = {v: k for k, v in _RATE_CODE.items()}


@register_element
class FlvMux(SinkElement):
    FACTORY = "flvmux"
    DESCRIPTION = "Muxes audio streams into a FLV stream"
    PAD_TEMPLATES = [PadTemplate("sink", PadDirection.SINK, _SINK_CAPS)]
    PROPERTIES = {"location": (str, "out.flv", "output path")}

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._file = None
        self._ts_ms = 0

    def set_info(self, incaps, outcaps):
        s = incaps[0]
        self._mt = s.name
        if self._mt == "audio/x-raw":
            self._ainfo = AudioInfo.from_caps_structure(s)
            self._fmt = 3
            self._rate = self._ainfo.rate
            self._channels = self._ainfo.channels
            self._width16 = self._ainfo.format == "S16LE"
        else:
            self._fmt = 7 if self._mt == "audio/x-alaw" else 8
            self._rate = s["rate"]
            self._channels = s["channels"]
            self._width16 = False

    def start(self):
        self._file = open(self.props["location"], "wb")
        self._file.write(b"FLV\x01\x04" + struct.pack(">I", 9))
        self._file.write(struct.pack(">I", 0))      # PreviousTagSize0
        self._ts_ms = 0

    def _tag(self, ttype: int, ts_ms: int, payload: bytes):
        hdr = (bytes([ttype]) + len(payload).to_bytes(3, "big")
               + (ts_ms & 0xFFFFFF).to_bytes(3, "big")
               + bytes([(ts_ms >> 24) & 0xFF]) + b"\0\0\0")
        self._file.write(hdr + payload)
        self._file.write(struct.pack(">I", 11 + len(payload)))

    def render(self, buf: Buffer) -> str:
        x = np.asarray(buf.data)
        if x.ndim == 1:
            x = x[:, None]
        if self._mt == "audio/x-raw":
            raw = (x.astype("<i2").tobytes() if self._width16
                   else (x.astype(np.int64) & 0xFF).astype(
                       np.uint8).tobytes())
        else:
            raw = x.astype(np.uint8).tobytes()
        rate_code = _RATE_CODE.get(self._rate, 0)
        hdr = ((self._fmt << 4) | (rate_code << 2)
               | ((1 if self._width16 else 0) << 1)
               | (1 if self._channels == 2 else 0))
        ts = (buf.pts // 1_000_000 if buf.pts is not None
              else self._ts_ms)
        self._tag(8, int(ts), bytes([hdr]) + raw)
        self._ts_ms = int(ts) + len(x) * 1000 // self._rate
        return "ok"

    def stop(self):
        if self._file is not None:
            self._file.close()
            self._file = None


@register_element
class FlvDemux(SourceElement):
    FACTORY = "flvdemux"
    DESCRIPTION = "Demuxes FLV streams into audio"
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC, Caps.any())]
    PROPERTIES = {"location": (str, "", "flv file path")}

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._tags = None
        self._pos = 0

    def _load(self):
        if self._tags is not None:
            return
        with open(self.props["location"], "rb") as f:
            data = f.read()
        if data[:3] != b"FLV":
            raise ValueError("flvdemux: bad signature")
        off = struct.unpack(">I", data[5:9])[0]
        pos = off + 4
        tags = []
        first_hdr = None
        while pos + 11 <= len(data):
            ttype = data[pos]
            size = int.from_bytes(data[pos + 1:pos + 4], "big")
            ts = int.from_bytes(data[pos + 4:pos + 7], "big") \
                | (data[pos + 7] << 24)
            payload = data[pos + 11:pos + 11 + size]
            if ttype == 8 and payload:
                if first_hdr is None:
                    first_hdr = payload[0]
                tags.append((ts, payload[1:]))
            pos += 11 + size + 4
        if first_hdr is None:
            raise ValueError("flvdemux: no audio tags")
        fmt = first_hdr >> 4
        rate_code = (first_hdr >> 2) & 3
        width16 = (first_hdr >> 1) & 1
        stereo = first_hdr & 1
        channels = 2 if stereo else 1
        if fmt == 3:
            self._mt = "audio/x-raw"
            self._ainfo = AudioInfo(
                format="S16LE" if width16 else "U8",
                rate=_CODE_RATE[rate_code], channels=channels)
            self._caps = Caps([self._ainfo.to_caps_structure()])
        elif fmt in (7, 8):
            self._mt = ("audio/x-alaw" if fmt == 7
                        else "audio/x-mulaw")
            self._rate = 8000
            self._channels = channels
            self._caps = Caps.from_string(
                f"{self._mt}, rate=8000, channels={channels}")
        else:
            raise ValueError(f"flvdemux: unsupported sound format {fmt}")
        self._width16 = bool(width16)
        self._tags = tags

    def get_caps(self, filter=None):
        if self.props["location"]:
            try:
                self._load()
            except (OSError, ValueError):
                return Caps.any()
        caps = self._caps if self._tags is not None else Caps.any()
        if filter is not None and not caps.is_any:
            caps = caps.intersect(filter)
        return caps

    def start(self):
        self._load()
        self._pos = 0

    def create(self, n_frames: int) -> Optional[Buffer]:
        if self._pos >= len(self._tags):
            return None
        ts, raw = self._tags[self._pos]
        self._pos += 1
        if self._mt == "audio/x-raw":
            ch = self._ainfo.channels
            if self._width16:
                arr = np.frombuffer(raw, "<i2").reshape(-1, ch) \
                    .astype(np.int16)
            else:
                arr = np.frombuffer(raw, np.uint8).reshape(-1, ch)
            rate = self._ainfo.rate
        else:
            ch = self._channels
            arr = np.frombuffer(raw, np.uint8).reshape(-1, ch)
            rate = self._rate
        return Buffer(data=arr, batch=1, pts=ts * 1_000_000,
                      duration=len(arr) * 1_000_000_000 // rate)
