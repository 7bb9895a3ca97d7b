"""WAV file elements: wavparse-style reading and wavenc-style writing.

References: gst-plugins-good/gst/wavparse/gstwavparse.c,
gst-plugins-good/gst/wavenc/gstwavenc.c.  RIFF parsing is host-side;
sample payloads go straight to device arrays.
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np

from ..audio import format as afmt
from ..audio.info import AudioInfo
from ..core.buffer import Buffer, FlowReturn
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, SinkElement,
                            SourceElement, register_element)
from .audio_elements import AUDIO_CAPS


def parse_wav_header(path: str):
    """Returns (AudioInfo, data_offset, data_size)."""
    with open(path, "rb") as f:
        head = f.read(12)
        if head[:4] != b"RIFF" or head[8:12] != b"WAVE":
            raise ValueError(f"{path!r} is not a WAV file")
        rate = channels = bits = 0
        audio_fmt = 1
        while True:
            chunk = f.read(8)
            if len(chunk) < 8:
                raise ValueError("no data chunk")
            cid, csz = chunk[:4], struct.unpack("<I", chunk[4:])[0]
            if cid == b"fmt ":
                fmt_data = f.read(csz + (csz & 1))
                audio_fmt, channels, rate = struct.unpack(
                    "<HHI", fmt_data[:8])
                bits = struct.unpack("<H", fmt_data[14:16])[0]
            elif cid == b"data":
                offset = f.tell()
                return _wav_info(audio_fmt, bits, rate, channels), offset, csz
            else:
                f.seek(csz + (csz & 1), 1)


def _wav_info(audio_fmt, bits, rate, channels) -> AudioInfo:
    if audio_fmt == 3:
        fmt = "F32LE" if bits == 32 else "F64LE"
    else:
        fmt = {8: "U8", 16: "S16LE", 24: "S24LE", 32: "S32LE"}[bits]
    return AudioInfo(format=fmt, rate=rate, channels=channels)


@register_element
class WavParse(SourceElement):
    """wavparse (source-style: location property, like filesrc !
    wavparse collapsed — the pull-mode reference behavior)."""
    FACTORY = "wavparse"
    DESCRIPTION = "Parse a .wav file into raw audio"
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC, AUDIO_CAPS)]
    PROPERTIES = {
        "location": (str, "", "wav file path"),
        "blocksize": (int, 4096, "frames per buffer"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._info: Optional[AudioInfo] = None
        self._pos = 0

    def get_caps(self, filter=None):
        if self._info is None and self.props["location"]:
            try:
                self._info, self._off, self._size = parse_wav_header(
                    self.props["location"])
            except (OSError, ValueError):
                return Caps.any()
        caps = Caps([self._info.to_caps_structure()]) if self._info \
            else Caps.any()
        if filter is not None and not caps.is_any:
            caps = caps.intersect(filter)
        return caps

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        self._info, self._off, self._size = parse_wav_header(
            self.props["location"])
        self._file = open(self.props["location"], "rb")
        self._file.seek(self._off)
        self._pos = 0

    def stop(self):
        if getattr(self, "_file", None):
            self._file.close()
            self._file = None

    def do_seek(self, segment) -> bool:
        pos = segment.start * self._info.rate // 1_000_000_000
        self._pos = pos
        self._file.seek(self._off + pos * self._info.bpf)
        return True

    def create(self, n_frames: int) -> Optional[Buffer]:
        info = self._info
        want = self.props["blocksize"] * max(1, n_frames)
        remaining = (self._off + self._size) - self._file.tell()
        raw = self._file.read(min(want * info.bpf, max(0, remaining)))
        if not raw:
            return None
        n = len(raw) // info.bpf
        samples = afmt.from_bytes(
            info.finfo, np.frombuffer(raw[:n * info.bpf], np.uint8),
            info.channels)
        pts = self._pos * 1_000_000_000 // info.rate
        self._pos += n
        return Buffer(data=samples, pts=pts,
                      duration=n * 1_000_000_000 // info.rate)


@register_element
class WavEnc(SinkElement):
    """wavenc + filesink collapsed: write incoming audio as .wav."""
    FACTORY = "wavenc"
    DESCRIPTION = "Encode raw audio into WAV"
    PAD_TEMPLATES = [PadTemplate("sink", PadDirection.SINK, AUDIO_CAPS)]
    PROPERTIES = {"location": (str, "out.wav", "output path")}

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._file = None
        self._bytes = 0

    def set_info(self, incaps, outcaps):
        self._info = AudioInfo.from_caps_structure(incaps[0])

    def start(self):
        self._file = open(self.props["location"], "wb")
        self._file.write(b"\x00" * 44)      # placeholder header
        self._bytes = 0

    def render(self, buf: Buffer) -> str:
        raw = afmt.to_bytes(self._info.finfo, np.asarray(buf.data))
        self._file.write(raw.tobytes())
        self._bytes += raw.size
        return FlowReturn.OK

    def stop(self):
        if self._file is None:
            return
        info = self._info
        f = info.finfo
        audio_fmt = 3 if f.is_float else 1
        bits = f.width
        self._file.seek(0)
        self._file.write(
            b"RIFF" + struct.pack("<I", 36 + self._bytes) + b"WAVE"
            + b"fmt " + struct.pack(
                "<IHHIIHH", 16, audio_fmt, info.channels, info.rate,
                info.rate * info.bpf, info.bpf, bits)
            + b"data" + struct.pack("<I", self._bytes))
        self._file.close()
        self._file = None
