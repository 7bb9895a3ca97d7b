"""bayer2rgb / rgb2bayer — Bayer mosaic (de)mosaicing.

TPU-native re-design of gst-plugins-bad/gst/bayer/:
* gstbayer2rgb.c — bilinear demosaic via horizontal split+upsample of
  each source line into the two color phases (the DEST0/DEST1 tables at
  gstbayer2rgb.c:407-466) followed by a 3-line merge
  (bayer_orc_merge_bg_* / _gr_*, gstbayerorc.orc:43-91: R/B from the
  rounded average of the previous+next lines, G from
  avg(avg(prev,next),cur) on the non-green sample and the line's own G
  on the green sample).  Format symmetry handling as in
  gst_bayer2rgb_process (gstbayer2rgb.c:585-597): RGGB/GBRG swap the
  R/B outputs, GRBG/GBRG swap the row roles.
* gstrgb2bayer.c — mosaic extraction: pos=(row&1)<<1|(col&1), B where
  pos==fmt, R where pos==fmt^3, else G (gstrgb2bayer.c:317-343);
  deep output scales v<<(bpp-8)|v>>(16-bpp) (bayer_scale_and_swap
  gstrgb2bayer.c:271).
* depth adaptation: 16->16 out = min(65535, v*65535>>bpp)
  (bayer16to16_orc_reorder gstbayerorc.orc:494), 16->8 out =
  sat8(v>>(bpp-8)) (bayer16to8 :511), 8->16 out = v<<8|v (bayer8to16
  :526).

Instead of the reference's per-line ring buffer + ORC row kernels, the
whole frame is demosaiced as one fused XLA expression (shifted slices +
selects) over the batch — every op is elementwise/VPU-friendly and fuses
with the downstream convert in the pipeline's single program.

Edge semantics match the reference exactly, including the quirky bottom
row: the reference's 8-line ring means output row h-1 reads the
pre-processed pair of source row h-4 as its "next" line
(LINE() macro, gstbayer2rgb.c:549 with j*2+2 wrapped mod 8).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)
from ..core.value import IntRange

_PATTERNS = ["bggr", "gbrg", "grbg", "rggb"]   # gstrgb2bayer.h:39 order
_DEPTHS = [8, 10, 12, 14, 16]

BAYER_FORMATS = []
for _p in _PATTERNS:
    BAYER_FORMATS.append(_p)
    for _d in (10, 12, 14, 16):
        BAYER_FORMATS.extend([f"{_p}{_d}le", f"{_p}{_d}be"])

BAYER_CAPS = ("video/x-bayer, format={ " + ", ".join(BAYER_FORMATS)
              + " }, width=[2,32767], height=[2,32767], "
              "framerate=[0/1,2147483647/1]")
RGB_OUT_CAPS = ("video/x-raw, format={ RGBA, BGRA, ARGB, ABGR, RGBx, "
                "BGRx, xRGB, xBGR, RGBA64_LE }, width=[2,32767], "
                "height=[2,32767], framerate=[0/1,2147483647/1]")


def parse_bayer_format(fmt: str):
    """-> (pattern, bpp, bigendian)."""
    pat = fmt[:4]
    if pat not in _PATTERNS:
        raise ValueError(f"unknown bayer format {fmt!r}")
    if len(fmt) == 4:
        return pat, 8, False
    bpp = int(fmt[4:-2])
    if bpp not in _DEPTHS:
        raise ValueError(f"unsupported bayer depth in {fmt!r}")
    return pat, bpp, fmt.endswith("be")


def _avg(a, b):
    """avgub/avguw: (a + b + 1) >> 1 (rounded)."""
    return (a + b + 1) >> 1


def demosaic_fn(pattern: str, bpp: int, out16: bool, height: int,
                width: int):
    """Pure fn: (B,H,W) mosaic plane -> (R,G,B,A) planes.

    Bilinear demosaic per gstbayer2rgb.c; math in int32, output
    uint8/uint16."""
    import jax.numpy as jnp

    if width % 2 or height % 2:
        raise ValueError("bayer demosaic requires even dimensions")
    rows_gr_first = pattern in ("grbg", "gbrg")   # swap merge order
    swap_rb = pattern in ("rggb", "gbrg")         # swap r/b offsets

    h, w = height, width
    # row ring semantics: prev(0)=1, next(h-1)=h-4 (h>=4), else clamp
    pidx = np.arange(h) - 1
    pidx[0] = 1
    nidx = np.arange(h) + 1
    nidx[h - 1] = h - 4 if h >= 4 else h - 2
    ce = (np.arange(w) % 2 == 0)                  # even column
    re = (np.arange(h) % 2 == 0)                  # even row
    if rows_gr_first:
        re = ~re
    odtype = jnp.uint16 if out16 else jnp.uint8
    alpha_v = 65535 if out16 else 255

    def fn(x):
        if isinstance(x, (tuple, list)):
            x = x[0]
        x = x.astype(jnp.int32)
        # horizontal split+upsample (DEST0/DEST1 tables,
        # gstbayer2rgb.c:407-466); edges overridden after the bulk
        xl = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
        xr = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
        nbr = _avg(xl, xr)
        cej = jnp.asarray(ce)
        e0 = jnp.where(cej, x, nbr)
        e1 = jnp.where(cej, nbr, x)
        # col 0: dest1 = src[1]; col w-2: dest1 = src[w-3];
        # col w-1: dest0 = src[w-2]
        e1 = e1.at[..., 0].set(x[..., 1])
        e1 = e1.at[..., w - 2].set(x[..., w - 3])
        e0 = e0.at[..., w - 1].set(x[..., w - 2])
        # vertical merge: v0/v1 = rounded avg of prev/next line phases
        p0, p1 = e0[:, pidx], e1[:, pidx]
        n0, n1 = e0[:, nidx], e1[:, nidx]
        v0, v1 = _avg(p0, n0), _avg(p1, n1)
        rej = jnp.asarray(re)[:, None]
        # "BG" rows (B on even cols): B=e0, R=v1,
        #   G = even col: avg(v0, e1) (3-line avg), odd col: e1
        # "GR" rows (G on even cols): B=v0, R=e1,
        #   G = even col: e0, odd col: avg(v1, e0)
        b = jnp.where(rej, e0, v0)
        r = jnp.where(rej, v1, e1)
        g = jnp.where(rej,
                      jnp.where(cej, _avg(v0, e1), e1),
                      jnp.where(cej, e0, _avg(v1, e0)))
        if swap_rb:
            r, b = b, r
        if bpp == 8:
            if out16:                       # bayer8to16: splat v<<8|v
                conv = lambda v: ((v << 8) | v).astype(jnp.uint16)
            else:
                conv = lambda v: v.astype(jnp.uint8)
        elif out16:                         # bayer16to16_orc_reorder
            conv = lambda v: jnp.minimum(
                (v * 65535) >> bpp, 65535).astype(jnp.uint16)
        else:                               # bayer16to8_orc_reorder
            conv = lambda v: jnp.minimum(
                v >> (bpp - 8), 255).astype(jnp.uint8)
        a = jnp.full_like(r, alpha_v).astype(odtype)
        return (conv(r), conv(g), conv(b), a)

    return fn


def demosaic_ref(x: np.ndarray, pattern: str, bpp: int = 8,
                 out16: bool = False) -> np.ndarray:
    """Scalar gold (per-pixel transcription of the documented tables) —
    used by tests; independent of the vectorized path."""
    h, w = x.shape
    x = x.astype(np.int64)
    e0 = np.zeros_like(x)
    e1 = np.zeros_like(x)
    for j in range(h):
        for i in range(w):
            if i == 0:
                e0[j, i], e1[j, i] = x[j, 0], x[j, 1]
            elif i == w - 1:
                e0[j, i], e1[j, i] = x[j, w - 2], x[j, w - 1]
            elif i == w - 2:
                e0[j, i], e1[j, i] = x[j, w - 2], x[j, w - 3]
            elif i % 2 == 0:
                e0[j, i] = x[j, i]
                e1[j, i] = (x[j, i - 1] + x[j, i + 1] + 1) >> 1
            else:
                e0[j, i] = (x[j, i - 1] + x[j, i + 1] + 1) >> 1
                e1[j, i] = x[j, i]
    out = np.zeros((h, w, 4), np.int64)
    gr_first = pattern in ("grbg", "gbrg")
    swap_rb = pattern in ("rggb", "gbrg")
    avg = lambda a, b: (a + b + 1) >> 1
    for j in range(h):
        pj = 1 if j == 0 else j - 1
        nj = (h - 4 if h >= 4 else h - 2) if j == h - 1 else j + 1
        bg_row = (j % 2 == 0) != gr_first
        for i in range(w):
            if bg_row:
                b = e0[j, i]
                r = avg(e1[pj, i], e1[nj, i])
                g3 = avg(avg(e0[pj, i], e0[nj, i]), e1[j, i])
                g = g3 if i % 2 == 0 else e1[j, i]
            else:
                b = avg(e0[pj, i], e0[nj, i])
                r = e1[j, i]
                g3 = avg(avg(e1[pj, i], e1[nj, i]), e0[j, i])
                g = e0[j, i] if i % 2 == 0 else g3
            if swap_rb:
                r, b = b, r
            out[j, i] = (r, g, b, 0)
    if bpp == 8:
        out = ((out << 8) | out) if out16 else out
    elif out16:
        out = np.minimum((out * 65535) >> bpp, 65535)
    else:
        out = np.minimum(out >> (bpp - 8), 255)
    out[..., 3] = 65535 if out16 else 255
    return out.astype(np.uint16 if out16 else np.uint8)


@register_element
class Bayer2RGB(TransformElement):
    """bayer2rgb (gstbayer2rgb.c): video/x-bayer -> RGB(A)."""
    FACTORY = "bayer2rgb"
    DESCRIPTION = "Converts Bayer-mosaic video to RGB"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, BAYER_CAPS),
        PadTemplate("src", PadDirection.SRC, RGB_OUT_CAPS),
    ]

    def transform_caps(self, direction, caps, filter=None):
        out = []
        for s in caps:
            tmpl = (RGB_OUT_CAPS if direction == PadDirection.SINK
                    else BAYER_CAPS)
            ns = Caps.from_string(tmpl)[0].copy()
            for key in ("width", "height", "framerate"):
                if key in s.fields:
                    ns[key] = s[key]
            out.append(ns)
        res = Caps(out).simplify()
        if filter is not None:
            res = res.intersect(filter)
        return res

    def fixate_caps(self, direction, caps, othercaps):
        out = othercaps.truncate()[0].copy()
        if direction == PadDirection.SINK:
            # default dest depth follows the source depth
            # (gstbayer2rgb.c:568-580: >8bpp emits RGBA64)
            _, bpp, _ = parse_bayer_format(caps[0]["format"])
            fmt = out.get("format")
            if fmt is not None and not isinstance(fmt, str):
                out["format"] = "RGBA64_LE" if bpp > 8 else "RGBA"
        else:
            fmt = out.get("format")
            if fmt is not None and not isinstance(fmt, str):
                out["format"] = "bggr"
        return Caps([out]).fixate()

    def set_info(self, incaps, outcaps):
        s = incaps[0]
        self._pattern, self._bpp, self._be = \
            parse_bayer_format(s["format"])
        self._w, self._h = s["width"], s["height"]
        self._out16 = "64" in outcaps[0]["format"]

    def make_fn(self):
        return demosaic_fn(self._pattern, self._bpp, self._out16,
                           self._h, self._w)


@register_element
class RGB2Bayer(TransformElement):
    """rgb2bayer (gstrgb2bayer.c): ARGB -> video/x-bayer."""
    FACTORY = "rgb2bayer"
    DESCRIPTION = "Converts RGB video to a Bayer mosaic"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK,
                    "video/x-raw, format=ARGB, width=[2,32767], "
                    "height=[2,32767], framerate=[0/1,2147483647/1]"),
        PadTemplate("src", PadDirection.SRC, BAYER_CAPS),
    ]

    def transform_caps(self, direction, caps, filter=None):
        out = []
        for s in caps:
            tmpl = (BAYER_CAPS if direction == PadDirection.SINK
                    else self.PAD_TEMPLATES[0].caps)
            base = tmpl if isinstance(tmpl, Caps) else Caps.from_string(tmpl)
            ns = base[0].copy()
            for key in ("width", "height", "framerate"):
                if key in s.fields:
                    ns[key] = s[key]
            out.append(ns)
        res = Caps(out).simplify()
        if filter is not None:
            res = res.intersect(filter)
        return res

    def fixate_caps(self, direction, caps, othercaps):
        out = othercaps.truncate()[0].copy()
        fmt = out.get("format")
        if fmt is not None and not isinstance(fmt, str):
            out["format"] = "bggr" if direction == PadDirection.SINK \
                else "ARGB"
        return Caps([out]).fixate()

    def set_info(self, incaps, outcaps):
        self._pattern, self._bpp, self._be = \
            parse_bayer_format(outcaps[0]["format"])
        s = incaps[0]
        self._w, self._h = s["width"], s["height"]

    def make_fn(self):
        import jax.numpy as jnp
        fmt_idx = _PATTERNS.index(self._pattern)
        bpp = self._bpp
        h, w = self._h, self._w
        # pos = (row&1)<<1 | (col&1); channel: B at pos==fmt,
        # R at pos==fmt^3, else G (gstrgb2bayer.c:317)
        pos = ((np.arange(h)[:, None] & 1) << 1) | (np.arange(w) & 1)
        sel = np.where(pos == fmt_idx, 2,
                       np.where(pos == (fmt_idx ^ 3), 0, 1))

        def fn(planes):
            r, g, b = (p.astype(jnp.int32) for p in planes[:3])
            selj = jnp.asarray(sel)
            v = jnp.where(selj == 2, b, jnp.where(selj == 0, r, g))
            if bpp == 8:
                return v.astype(jnp.uint8)
            # bayer_scale_and_swap (gstrgb2bayer.c:273)
            return ((v << (bpp - 8)) | (v >> (16 - bpp))
                    ).astype(jnp.uint16)

        return fn
