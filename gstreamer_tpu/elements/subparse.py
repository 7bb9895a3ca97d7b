"""subparse — subtitle parsing (SRT / WebVTT) and wavenc.

References: gst-plugins-base/gst/subparse/gstsubparse.c (format
autodetection + per-format parsers -> timed text/x-raw buffers);
gst-plugins-good/gst/wavenc/gstwavenc.c (RIFF/WAVE header writer).
"""

from __future__ import annotations

import re
import struct
from typing import List, Optional, Tuple

import numpy as np

from ..core.buffer import Buffer, FlowReturn
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, SinkElement,
                            TransformElement, register_element)

_SRT_TIME = re.compile(
    r"(\d+):(\d\d):(\d\d)[,.](\d{1,3})\s*-->\s*"
    r"(\d+):(\d\d):(\d\d)[,.](\d{1,3})")


def _ts(h, m, s, ms) -> int:
    return ((int(h) * 3600 + int(m) * 60 + int(s)) * 1000
            + int(ms)) * 1_000_000


def parse_srt(text: str) -> List[Tuple[int, int, str]]:
    """(start_ns, end_ns, text) cues from SubRip text."""
    cues = []
    for block in re.split(r"\n\s*\n", text.strip()):
        lines = block.strip().splitlines()
        if not lines:
            continue
        # optional numeric index line
        if lines and lines[0].strip().isdigit():
            lines = lines[1:]
        if not lines:
            continue
        m = _SRT_TIME.search(lines[0])
        if not m:
            continue
        start = _ts(*m.groups()[:4])
        end = _ts(*m.groups()[4:])
        cues.append((start, end, "\n".join(lines[1:]).strip()))
    return cues


def parse_vtt(text: str) -> List[Tuple[int, int, str]]:
    """WebVTT cues (header line stripped; same arrow syntax)."""
    text = text.strip()
    if text.startswith("WEBVTT"):
        text = text.split("\n", 1)[1] if "\n" in text else ""
    return parse_srt(text)


@register_element
class SubParse(TransformElement):
    """subparse: byte stream -> timed text buffers (one per cue)."""
    FACTORY = "subparse"
    DESCRIPTION = "Parses subtitle (SRT/WebVTT) files into text buffers"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, Caps.any()),
        PadTemplate("src", PadDirection.SRC,
                    "text/x-raw, format=utf8"),
    ]

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._acc = b""
        self._emitted = 0

    def transform_caps(self, direction, caps, filter=None):
        res = (Caps.from_string("text/x-raw, format=utf8")
               if direction == PadDirection.SINK else Caps.any())
        if filter is not None:
            res = res.intersect(filter)
        return res

    def start(self):
        self._acc = b""
        self._emitted = 0

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        data = buf.data
        leaves = data if isinstance(data, (tuple, list)) else (data,)
        for leaf in leaves:
            self._acc += np.asarray(leaf).tobytes()
        text = self._acc.decode("utf-8", errors="replace")
        cues = (parse_vtt(text) if text.lstrip().startswith("WEBVTT")
                else parse_srt(text))
        new = cues[self._emitted:]
        # hold back the final cue unless the block is clearly terminated
        # (more bytes may extend it)
        if new and not text.rstrip().endswith(("\n", ".")) \
                and len(new) > 1:
            new = new[:-1]
        if not new:
            return None
        self._emitted += len(new)
        start, end, _ = new[0]
        return buf.with_(data=[t for (_, _, t) in new],
                         pts=start, duration=end - start, batch=len(new),
                         meta=dict(buf.meta, cues=new))


@register_element
class EncodeBin(SinkElement):
    """encodebin (gst-plugins-base/gst/encoding/gstencodebin.c):
    profile-driven output construction — the encoding profile picks the
    muxer/encoder chain.  Covers the containers the framework writes
    (WAV via wavenc, YUV4MPEG via y4menc)."""
    FACTORY = "encodebin"
    DESCRIPTION = "Convenience encoding/muxing element (profile-driven)"
    PAD_TEMPLATES = [PadTemplate("sink", PadDirection.SINK, Caps.any())]
    PROPERTIES = {
        "profile": (object, None, "EncodingProfile or spec string"),
        "location": (str, "out.bin", "output path"),
    }

    _SINKS = {
        "audio/x-wav": "wavenc",
        "application/x-yuv4mpeg": "y4menc",
        "video/x-yuv4mpeg": "y4menc",
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._inner = None

    def _profile_format(self):
        from ..utils.pbutils import EncodingProfile, profile_from_string
        p = self.props["profile"]
        if isinstance(p, str):
            p = profile_from_string(p)
        if p is None:
            raise ValueError("encodebin requires a profile")
        return p.format[0].name

    def transform_caps(self, direction, caps, filter=None):
        res = caps
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        from ..core.element import element_factory_make
        fmt = self._profile_format()
        factory = self._SINKS.get(fmt)
        if factory is None:
            raise ValueError(f"encodebin: unsupported profile format "
                             f"{fmt!r} (supported: {list(self._SINKS)})")
        self._inner = element_factory_make(
            factory, location=self.props["location"])
        self._inner.set_info(incaps, None)

    def start(self):
        if self._inner is not None:
            self._inner.start()

    def stop(self):
        if self._inner is not None:
            self._inner.stop()

    def render(self, buf: Buffer) -> str:
        return self._inner.render(buf)
