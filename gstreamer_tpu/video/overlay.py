"""Video overlay composition — subtitle/logo overlay rectangles.

TPU-native re-design of GstVideoOverlayComposition /
GstVideoOverlayRectangle (subprojects/gst-plugins-base/gst-libs/gst/
video/video-overlay-composition.c) and the blending utilities
(video-blend.c).

Exact integer semantics reproduced:

* gst_video_blend (video-blend.c:299): per-pixel A-OVER-B in the 8-bit
  unpack domain with the BLENDLOOP macro (:411):
    asrc        = src_a * alpha_val / max   (then << shift for 16-bit)
    (asrc == 0 -> pixel untouched)
    final_alpha = asrc + adst * (max - asrc) / max
    dest_a      = final_alpha;  divisor = max(final_alpha, 1)
  and the four OVERxy operators (:246-282) for the premultiplied
  source/destination combinations; colors clamp high only (MIN) like
  BLENDC (:284).
* fixed-matrix colorspace adaption of the overlay when RGB-ness differs
  (matrix_rgb_to_yuv :97 coefficients 47/157/16 etc., matrix_yuv_to_rgb
  :117, matrix_prea_rgb_to_yuv :68 with un-premultiply).
* gst_video_blend_scale_linear_RGBA (video-blend.c:156): the 16.16
  fixed-point bilinear used to scale rectangles to their render size —
  increments ((n-1)<<16)/(dn-1) - 1, per-row copy when frac==0 else
  video_orc_merge_linear_u8 (video-orc.orc:1121, modular u16 math),
  horizontal ldreslinl weights (tmp>>8)&0xff (video-orc-dist.c:15022).

Whole rectangles blend as single fused XLA ops over the batched frame;
the reference's per-line unpack/blend/pack loop becomes slicing on the
canonical channel planes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np


# -- rectangle scaling (gst_video_blend_scale_linear_RGBA) -----------------

def _resample_bilinear_u32(row: np.ndarray, x_increment: int,
                           dest_width: int) -> np.ndarray:
    """ldreslinl over one row of (W, 4) u8 pixels (exact orc emulation)."""
    tmp = np.arange(dest_width, dtype=np.int64) * x_increment
    j = (tmp >> 16).astype(np.int64)
    f = ((tmp >> 8) & 0xFF).astype(np.int64)
    a = row[j].astype(np.int64)
    b = row[np.minimum(j + 1, row.shape[0] - 1)].astype(np.int64)
    return ((a * (256 - f)[:, None] + b * f[:, None]) >> 8).astype(np.uint8)


def _merge_linear_u8(s1: np.ndarray, s2: np.ndarray, w: int) -> np.ndarray:
    """video_orc_merge_linear_u8: d = s1 + hi8((s2-s1)*w + 128), all in
    wrap-around u16/u8 arithmetic."""
    a = s1.astype(np.uint16)
    t2 = ((s2.astype(np.uint16) - a) * np.uint16(w) + np.uint16(128))
    t = (t2 >> 8).astype(np.uint8)
    return (t + s1.astype(np.uint8)).astype(np.uint8)


def scale_linear_rgba(pixels: np.ndarray, dest_width: int,
                      dest_height: int) -> np.ndarray:
    """Scale (H, W, 4) u8 ARGB pixels to (dest_height, dest_width, 4).

    Bit-exact port of gst_video_blend_scale_linear_RGBA
    (video-blend.c:156)."""
    src_h, src_w = pixels.shape[:2]
    if (src_h, src_w) == (dest_height, dest_width):
        return pixels
    y_inc = 0 if (dest_height == 1 or src_h == 1) else \
        ((src_h - 1) << 16) // (dest_height - 1) - 1
    x_inc = 0 if (dest_width == 1 or src_w == 1) else \
        ((src_w - 1) << 16) // (dest_width - 1) - 1

    hrows = np.stack([_resample_bilinear_u32(pixels[r], x_inc, dest_width)
                      for r in range(src_h)])
    out = np.empty((dest_height, dest_width, 4), np.uint8)
    acc = 0
    for i in range(dest_height):
        j = acc >> 16
        x = acc & 0xFFFF
        if x == 0:
            out[i] = hrows[j]
        else:
            out[i] = _merge_linear_u8(hrows[j], hrows[min(j + 1, src_h - 1)],
                                      x >> 8)
        acc += y_inc
    return out


# -- fixed conversion matrices (video-blend.c:64-137) ----------------------

def _matrix_rgb_to_yuv(px: np.ndarray, unpremultiply: bool) -> np.ndarray:
    px = px.astype(np.int64)
    a, r, g, b = px[..., 0], px[..., 1], px[..., 2], px[..., 3]
    if unpremultiply:
        safe = np.maximum(a, 1)
        r = np.where(a != 0, (r * 255 + a // 2) // safe, r)
        g = np.where(a != 0, (g * 255 + a // 2) // safe, g)
        b = np.where(a != 0, (b * 255 + a // 2) // safe, b)
    y = (47 * r + 157 * g + 16 * b + 4096) >> 8
    u = (-26 * r - 87 * g + 112 * b + 32768) >> 8
    v = (112 * r - 102 * g - 10 * b + 32768) >> 8
    out = np.stack([a, np.clip(y, 0, 255), np.clip(u, 0, 255),
                    np.clip(v, 0, 255)], axis=-1)
    return out.astype(np.uint8)


def _matrix_yuv_to_rgb(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.int64)
    a, y, u, v = px[..., 0], px[..., 1], px[..., 2], px[..., 3]
    r = (298 * y + 459 * v - 63514) >> 8
    g = (298 * y - 55 * u - 136 * v + 19681) >> 8
    b = (298 * y + 541 * u - 73988) >> 8
    out = np.stack([a, np.clip(r, 0, 255), np.clip(g, 0, 255),
                    np.clip(b, 0, 255)], axis=-1)
    return out.astype(np.uint8)


# -- overlay rectangle / composition ---------------------------------------

@dataclass
class VideoOverlayRectangle:
    """An ARGB overlay rectangle (gst_video_overlay_rectangle_new_raw).

    pixels: (H, W, 4) uint8 in canonical unpack order (A, R, G, B).
    render_x/y/width/height: placement on the video frame.
    """
    pixels: np.ndarray
    render_x: int = 0
    render_y: int = 0
    render_width: int = 0
    render_height: int = 0
    global_alpha: float = 1.0
    premultiplied: bool = False
    _scaled: Optional[np.ndarray] = field(default=None, repr=False)

    def __post_init__(self):
        self.pixels = np.asarray(self.pixels, np.uint8)
        if not self.render_width:
            self.render_width = self.pixels.shape[1]
        if not self.render_height:
            self.render_height = self.pixels.shape[0]

    def get_pixels_scaled(self) -> np.ndarray:
        """Rectangle pixels at render size (cached, like the reference's
        scaled-pixels cache in video-overlay-composition.c)."""
        if self._scaled is None:
            self._scaled = scale_linear_rgba(
                self.pixels, self.render_width, self.render_height)
        return self._scaled


class VideoOverlayComposition:
    """An ordered set of overlay rectangles
    (gst_video_overlay_composition_new / _add_rectangle)."""

    def __init__(self, rectangles: Sequence[VideoOverlayRectangle] = ()):
        self.rectangles: List[VideoOverlayRectangle] = list(rectangles)

    def add_rectangle(self, rect: VideoOverlayRectangle):
        self.rectangles.append(rect)

    @property
    def n_rectangles(self) -> int:
        return len(self.rectangles)

    def blend(self, xp, chans, dest_is_rgb: bool, width: int, height: int,
              dest_premultiplied: bool = False, bits: int = 8):
        """Blend all rectangles onto canonical channel planes
        (gst_video_overlay_composition_blend)."""
        for rect in self.rectangles:
            chans = video_blend(
                xp, chans, dest_is_rgb, rect.get_pixels_scaled(),
                rect.render_x, rect.render_y, rect.global_alpha,
                src_premultiplied=rect.premultiplied,
                dest_premultiplied=dest_premultiplied,
                width=width, height=height, bits=bits)
        return chans


def video_blend(xp, chans, dest_is_rgb: bool, src_argb: np.ndarray,
                x: int, y: int, global_alpha: float = 1.0,
                src_premultiplied: bool = False,
                dest_premultiplied: bool = False,
                width: int = 0, height: int = 0, bits: int = 8):
    """gst_video_blend: blend an ARGB image into canonical channel planes.

    chans: (A, c0, c1, c2) planes, each (..., H, W) int, in the frame's
    unpack domain (8- or 16-bit per `bits`).  Exact BLENDLOOP integer
    math (video-blend.c:411)."""
    a_pl, c0, c1, c2 = chans
    dest_h = height or c0.shape[-2]
    dest_w = width or c0.shape[-1]
    src_h, src_w = src_argb.shape[:2]

    # clip (video-blend.c:333,373-393)
    if x + src_w <= 0 or y + src_h <= 0 or x >= dest_w or y >= dest_h:
        return chans
    sx0 = -x if x < 0 else 0
    sy0 = -y if y < 0 else 0
    x = max(x, 0)
    y = max(y, 0)
    w = min(src_w - sx0, dest_w - x)
    h = min(src_h - sy0, dest_h - y)
    src = src_argb[sy0:sy0 + h, sx0:sx0 + w].astype(np.int64)

    # colorspace adaption of the overlay (fixed matrices)
    src_is_rgb = True   # overlay rectangles are ARGB by definition
    if src_is_rgb != dest_is_rgb:
        if src_is_rgb:
            src = _matrix_rgb_to_yuv(src, src_premultiplied).astype(np.int64)
            if src_premultiplied:
                src_premultiplied = False
        else:  # pragma: no cover - rectangles are always RGB
            src = _matrix_yuv_to_rgb(src).astype(np.int64)

    maxv = 255 if bits == 8 else 65535
    shift = 0 if bits == 8 else 8
    alpha_val = int(float(np.float32(maxv) * np.float32(global_alpha)))
    alpha_val = max(0, min(maxv, alpha_val))

    sa = src[..., 0]
    asrc_np = (sa * alpha_val) // maxv
    asrc_np = asrc_np << shift
    keep_np = asrc_np == 0

    asrc = xp.asarray(asrc_np)
    keep = xp.asarray(keep_np)
    sl = (Ellipsis, slice(y, y + h), slice(x, x + w))

    if a_pl is None:   # alpha plane elided -> opaque destination
        adst = xp.full((h, w), maxv, dtype=xp.int32).astype(xp.int64)
    else:
        adst = a_pl[sl].astype(xp.int64)
    final_alpha = asrc + adst * (maxv - asrc) // maxv
    new_a = xp.where(keep, adst, final_alpha)
    div_a = xp.maximum(final_alpha, 1)

    def blend_c(dc, s_col):
        dc = dc.astype(xp.int64)
        cA = xp.asarray(s_col << shift)
        if src_premultiplied and dest_premultiplied:      # OVER11
            c = (cA * alpha_val + dc * (maxv - asrc)) // maxv
        elif (not src_premultiplied) and dest_premultiplied:  # OVER01
            c = (cA * asrc + dc * (maxv - asrc)) // maxv
        elif src_premultiplied:                           # OVER10
            c = (cA * alpha_val + dc * adst * (maxv - asrc) // maxv) // div_a
        else:                                             # OVER00
            c = (cA * asrc + dc * adst * (maxv - asrc) // maxv) // div_a
        return xp.where(keep, dc, xp.minimum(c, maxv))

    out_chans = []
    for plane, col in ((a_pl, None), (c0, 1), (c1, 2), (c2, 3)):
        if plane is None:
            out_chans.append(None)
            continue
        dt = plane.dtype
        region = (new_a if col is None
                  else blend_c(plane[sl], src[..., col])).astype(dt)
        if hasattr(plane, "at"):
            plane = plane.at[sl].set(region)
        else:
            plane = plane.copy()
            plane[sl] = region
        out_chans.append(plane)
    return tuple(out_chans)
