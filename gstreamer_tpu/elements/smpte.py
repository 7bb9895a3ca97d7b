"""smpte / smptealpha — SMPTE wipe transitions.

Reference: subprojects/gst-plugins-good/gst/smpte/gstsmpte.c (2-input
I420 transition: gst_smpte_blend_i420 :389, position/end_position
:508-531, pos = ((1<<depth)+border)*position/end_position),
gstsmptealpha.c (alpha-channel wipe: process_ayuv_ayuv :333, pos =
((1<<depth)+border)*position :494).

The wipe mask rasterizes once on the host (video/smpte_mask.py, exact
paint.c port); the per-frame threshold + blend runs as one fused XLA op
over the batch with a per-frame position vector — the reference's
per-pixel scalar loop becomes:

    value = ((clamp(mask, pos-border, pos) - (pos-border)) << 8) // border
    out   = (in1 * value + in2 * (256 - value)) >> 8
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (AggregatorElement, PadDirection, PadPresence,
                            PadTemplate, TransformElement, register_element)
from ..video.info import VideoInfo
from ..video.smpte_mask import MASK_NAMES, MASK_TYPES, mask_factory_new

I420_CAPS = ("video/x-raw, format=I420, width=[1,32767], "
             "height=[1,32767], framerate=[0/1,2147483647/1]")
ALPHA_CAPS = ("video/x-raw, format={AYUV,ARGB,BGRA,RGBA}, width=[1,32767], "
              "height=[1,32767], framerate=[0/1,2147483647/1]")

_NAME_TO_TYPE = {v: k for k, v in MASK_NAMES.items()}


def _parse_type(value) -> int:
    if isinstance(value, str) and not value.lstrip("-").isdigit():
        if value not in _NAME_TO_TYPE:
            raise ValueError(f"unknown smpte transition {value!r}")
        return _NAME_TO_TYPE[value]
    t = int(value)
    if t not in MASK_TYPES:
        raise ValueError(f"unknown smpte transition type {t}")
    return t


@register_element
class SMPTE(AggregatorElement):
    FACTORY = "smpte"
    KLASS = "Filter/Editor/Video/Transition"
    DESCRIPTION = "Apply the standard SMPTE transitions on video images"
    HOST_ELEMENT = True   # frame-position-dependent blend
    PAD_TEMPLATES = [
        PadTemplate("src", PadDirection.SRC, I420_CAPS),
        PadTemplate("sink_%u", PadDirection.SINK, I420_CAPS,
                    PadPresence.REQUEST),
    ]
    PROPERTIES = {
        "type": (int, 1, "transition type (barboxwipes ids)"),
        "border": (int, 0, "border width of the transition"),
        "depth": (int, 16, "mask precision in bits"),
        "duration": (int, 1_000_000_000, "transition duration (ns)"),
        "invert": (bool, False, "invert the transition mask"),
    }

    def __init__(self, name=None, **props):
        if "type" in props:
            props["type"] = _parse_type(props["type"])
        super().__init__(name=name, **props)
        self._position = 0
        self._jit = None
        self._info: Optional[VideoInfo] = None

    def negotiate_output(self, in_caps: Dict[str, Caps], allowed: Caps) -> Caps:
        first = next(iter(in_caps.values())).fixate()
        self._info = VideoInfo.from_caps_structure(first[0])
        return first

    def start(self):
        self._position = 0
        self._jit = None

    def flush(self):
        self._position = 0

    def _end_position(self) -> int:
        # gstsmpte.c:278 gst_util_uint64_scale(duration, fps_n, SEC*fps_d)
        fps = self._info.fps
        return int(self.props["duration"]) * fps.num // (
            1_000_000_000 * fps.denom)

    def _build(self):
        import jax
        import jax.numpy as jnp

        info = self._info
        mask_np = mask_factory_new(self.props["type"], self.props["invert"],
                                   self.props["depth"],
                                   info.width, info.height)
        mask = jnp.asarray(np.minimum(mask_np, np.int64(2**31 - 1))
                           .astype(np.int32))
        border = int(self.props["border"]) or 1

        def fn(p1, p2, pos):
            # pos: (B,) int32; mask (H, W)
            mn = (pos - border)[:, None, None]
            mx = pos[:, None, None]
            value = ((jnp.clip(mask[None], mn, mx) - mn) << 8) // border
            vc = value[:, ::2, ::2]

            def blend(a, b, v):
                return ((a.astype(jnp.int32) * v
                         + b.astype(jnp.int32) * (256 - v)) >> 8
                        ).astype(jnp.uint8)

            return (blend(p1[0], p2[0], value),
                    blend(p1[1], p2[1], vc),
                    blend(p1[2], p2[2], vc))

        self._jit = jax.jit(fn)

    def host_aggregate(self, ins: Dict[str, Buffer]) -> Optional[Buffer]:
        names = sorted(ins)
        b1, b2 = ins[names[0]], ins[names[-1]]
        if self._jit is None:
            self._build()
        batch = b1.data[0].shape[0]
        end = max(self._end_position(), 1)
        top = (1 << self.props["depth"]) + (int(self.props["border"]) or 0)
        idx = np.arange(self._position, self._position + batch,
                        dtype=np.int64)
        idx = np.minimum(idx, end)   # past the end: pos -> full, output in2
        pos = (top * idx // end).astype(np.int32)
        self._position += batch
        out = self._jit(tuple(b1.data), tuple(b2.data), pos)
        return b1.with_(data=tuple(out))


@register_element
class SMPTEAlpha(TransformElement):
    FACTORY = "smptealpha"
    KLASS = "Filter/Editor/Video"
    DESCRIPTION = "Apply SMPTE transitions by setting alpha"
    HOST_ELEMENT = True   # `position` is animated per buffer
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, ALPHA_CAPS),
        PadTemplate("src", PadDirection.SRC, ALPHA_CAPS),
    ]
    PROPERTIES = {
        "type": (int, 1, "transition type"),
        "border": (int, 0, "border width"),
        "depth": (int, 16, "mask bits"),
        "position": (float, 0.0, "transition position [0..1]"),
        "invert": (bool, False, "invert the mask"),
    }

    def __init__(self, name=None, **props):
        if "type" in props:
            props["type"] = _parse_type(props["type"])
        super().__init__(name=name, **props)
        self._info: Optional[VideoInfo] = None
        self._alpha_idx = 3
        self._jit = None

    def set_info(self, incaps, outcaps):
        if incaps is not None:
            self._info = VideoInfo.from_caps_structure(incaps[0])
            self._jit = None

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        import jax
        import jax.numpy as jnp

        info = self._info
        if self._jit is None:
            mask_np = mask_factory_new(self.props["type"],
                                       self.props["invert"],
                                       self.props["depth"],
                                       info.width, info.height)
            mask = jnp.asarray(np.minimum(mask_np, np.int64(2**31 - 1))
                               .astype(np.int32))
            border = int(self.props["border"]) or 1

            def fn(a, pos):
                mn, mx = pos - border, pos
                value = ((jnp.clip(mask, mn, mx) - mn) << 8) // border
                return ((a.astype(jnp.int32) * value) >> 8).astype(a.dtype)

            self._jit = jax.jit(fn)

        # gstsmptealpha.c:494 — double multiply, truncated to gint
        pos = int(((1 << self.props["depth"])
                   + (int(self.props["border"]) or 0))
                  * float(self.props["position"]))
        data = list(buf.data)
        data[self._alpha_idx] = self._jit(data[self._alpha_idx],
                                          np.int32(pos))
        return buf.with_(data=tuple(data))
