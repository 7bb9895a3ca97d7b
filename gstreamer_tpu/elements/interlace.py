"""interlace — progressive to interlaced conversion.

Reference: subprojects/gst-plugins-bad/gst/interlace/gstinterlace.c —
PulldownFormat table :364 ("1:1" 60p->60i weaves fields from successive
frames at half rate; "2:2" 30p->60i marks both fields of each frame),
field-flag handling (TFF), caps interlace-mode=interleaved.

Telecine patterns (2:3 etc.) produce "mixed" streams and are deferred;
1:1 and 2:2 cover the interleaved modes the deinterlace element
round-trips."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.buffer import Buffer, BufferFlags
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)
from ..core.value import Fraction
from ..video.info import VideoInfo
from .videotestsrc import FORMAT_LIST

VIDEO_CAPS = (f"video/x-raw, format={FORMAT_LIST}, width=[1,32767], "
              f"height=[1,32767], framerate=[0/1,2147483647/1]")


@register_element
class Interlace(TransformElement):
    FACTORY = "interlace"
    DESCRIPTION = "Creates an interlaced video from progressive frames"
    HOST_ELEMENT = True   # 1:1 pairs successive frames
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, VIDEO_CAPS),
        PadTemplate("src", PadDirection.SRC, VIDEO_CAPS),
    ]
    PROPERTIES = {
        "field-pattern": (str, "2:3", "1:1|2:2 (telecine deferred)"),
        "top-field-first": (bool, False, "field order"),
    }

    def __init__(self, name=None, **props):
        if props.get("field-pattern", "2:2") not in ("1:1", "2:2"):
            props["field-pattern"] = "2:2"
        super().__init__(name=name, **props)
        self._info: Optional[VideoInfo] = None
        self._pending = None

    def transform_caps(self, direction, caps, filter=None):
        out = []
        ratio = Fraction(1, 2) if self.props.get("field-pattern") == "1:1" \
            else Fraction(1, 1)
        for s in caps:
            ns = s.copy()
            fr = ns.fields.get("framerate")
            if isinstance(fr, Fraction):
                if direction == PadDirection.SINK:
                    ns["framerate"] = Fraction(fr.num * ratio.num,
                                               fr.denom * ratio.denom)
                else:
                    ns["framerate"] = Fraction(fr.num * ratio.denom,
                                               fr.denom * ratio.num)
            out.append(ns)
        res = Caps(out).simplify()
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        if incaps is not None:
            self._info = VideoInfo.from_caps_structure(incaps[0])

    def start(self):
        self._pending = None

    def flush(self):
        self._pending = None

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        tff = self.props["top-field-first"]
        flags = buf.flags | (BufferFlags.INTERLACED_TFF if tff else 0)
        if self.props["field-pattern"] == "2:2":
            # both fields from the same frame: content unchanged, stream
            # becomes interleaved with doubled field rate
            return buf.with_(flags=flags)
        # 1:1: weave fields of successive frame pairs at half rate
        planes = [np.asarray(p) for p in buf.data]
        if self._pending is not None:
            planes = [np.concatenate([pp, p])
                      for pp, p in zip(self._pending[0], planes)]
            pts = self._pending[1]
        else:
            pts = buf.pts
        n = planes[0].shape[0]
        if n < 2:
            self._pending = (planes, pts)
            return None
        pairs = n // 2
        if n % 2:
            self._pending = ([p[-1:] for p in planes],
                             (pts or 0) + (buf.duration or 0) * (n - 1))
        else:
            self._pending = None

        def weave(p):
            even = p[0:2 * pairs:2]     # first of each pair
            odd = p[1:2 * pairs:2]      # second of each pair
            out = even.copy()
            if tff:
                out[:, 1::2] = odd[:, 1::2]    # bottom field from frame 2
            else:
                out[:, 0::2] = odd[:, 0::2]    # top field from frame 2
            return out

        data = tuple(weave(p) for p in planes)
        dur = (buf.duration or 0) * 2
        return Buffer(data=data, pts=pts, duration=dur, batch=pairs,
                      flags=flags)
