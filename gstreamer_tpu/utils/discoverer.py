"""Discoverer — media introspection (pbutils equivalent).

Reference: subprojects/gst-plugins-base/gst-libs/gst/pbutils/
gstdiscoverer.c — synchronous/async URI introspection returning stream
topology, caps, and duration.

Covers the container/raw formats the framework ingests (y4m, wav, raw
with caps).  Returns a DiscovererInfo with video/audio stream infos.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import List, Optional

from ..core.caps import Caps
from ..core.value import Fraction


@dataclass
class StreamInfo:
    kind: str                  # "video" | "audio" | "unknown"
    caps: Optional[Caps] = None
    width: int = 0
    height: int = 0
    fps: Optional[Fraction] = None
    rate: int = 0
    channels: int = 0
    format: str = ""


@dataclass
class DiscovererInfo:
    uri: str
    duration_ns: Optional[int] = None
    streams: List[StreamInfo] = field(default_factory=list)

    @property
    def video_streams(self):
        return [s for s in self.streams if s.kind == "video"]

    @property
    def audio_streams(self):
        return [s for s in self.streams if s.kind == "audio"]


class Discoverer:
    """gst_discoverer_discover_uri equivalent for supported inputs."""

    def discover(self, path: str) -> DiscovererInfo:
        if path.startswith("file://"):
            path = path[7:]
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        with open(path, "rb") as f:
            head = f.read(64)
        info = DiscovererInfo(uri=path)
        if head.startswith(b"YUV4MPEG2 "):
            self._discover_y4m(path, head, info)
        elif head.startswith(b"RIFF") and head[8:12] == b"WAVE":
            self._discover_wav(path, info)
        else:
            info.streams.append(StreamInfo(kind="unknown"))
        return info

    def _discover_y4m(self, path, head, info):
        hdr = head.split(b"\n", 1)[0].decode()
        params = {tok[0]: tok[1:] for tok in hdr.split()[1:]}
        w, h = int(params.get("W", 0)), int(params.get("H", 0))
        fps = params.get("F", "30:1").split(":")
        fpsf = Fraction(int(fps[0]), int(fps[1]))
        fmt = {"420": "I420", "420jpeg": "I420", "420mpeg2": "I420",
               "422": "Y42B", "444": "Y444", "mono": "GRAY8",
               }.get(params.get("C", "420jpeg"), "I420")
        from ..video.format import format_info, frame_size
        fsz = frame_size(format_info(fmt), w, h) + 6
        n_frames = (os.path.getsize(path) - len(hdr) - 1) // fsz
        dur = (n_frames * 1_000_000_000 * fpsf.denom // fpsf.num
               if fpsf.num else None)
        info.duration_ns = dur
        info.streams.append(StreamInfo(
            kind="video", width=w, height=h, fps=fpsf, format=fmt,
            caps=Caps.from_string(
                f"video/x-raw, format={fmt}, width={w}, height={h}, "
                f"framerate={fpsf.num}/{fpsf.denom}")))

    def _discover_wav(self, path, info):
        with open(path, "rb") as f:
            data = f.read(256)
        # minimal RIFF/fmt parse
        pos = 12
        rate = channels = bits = 0
        audio_fmt = 1
        data_size = None
        size = os.path.getsize(path)
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            csz = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if cid == b"fmt ":
                audio_fmt, channels, rate = struct.unpack(
                    "<HHI", data[pos + 8:pos + 16])
                bits = struct.unpack("<H", data[pos + 22:pos + 24])[0]
            if cid == b"data":
                data_size = csz
                break
            pos += 8 + csz + (csz & 1)
        if data_size is None:
            data_size = size - 44
        fmt = {8: "U8", 16: "S16LE", 24: "S24LE", 32: "S32LE"}.get(bits,
                                                                   "S16LE")
        if audio_fmt == 3:
            fmt = "F32LE" if bits == 32 else "F64LE"
        bpf = max(1, (bits // 8) * channels)
        dur = (data_size // bpf) * 1_000_000_000 // rate if rate else None
        info.duration_ns = dur
        info.streams.append(StreamInfo(
            kind="audio", rate=rate, channels=channels, format=fmt,
            caps=Caps.from_string(
                f"audio/x-raw, format={fmt}, rate={rate}, "
                f"channels={channels}, layout=interleaved")))
