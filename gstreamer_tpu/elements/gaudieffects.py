"""gaudieffects — burn / chromium / dilate / dodge / exclusion /
solarize / gaussianblur.

Exact ports of gst-plugins-bad/gst/gaudieffects/ as fused device
expressions over canonical (R,G,B,A) planes (the reference works on
BGRx/RGBx words; component roles map 1:1):
* burn (gstgaudieffectsorc.orc gaudi_orc_burn): 16-bit lane math
  out = 255 - (((255-v)<<7) / ((v+adj)>>1)), divide-by-zero -> 0xFFFF
  (ORC divluw), final convwb truncation; applied to all four bytes in
  the reference — here to R,G,B (the x byte is undefined padding).
* chromium (gstchromium.c:114): v' = |cosTable[(v+edge_a+(v*edge_b)/2)
  & 1023]| with the 1024-entry *512 integer cosine table.
* dilate (gstdilate.c): neighborhood max/min by luminance
  90R+115G+51B, candidate order down,right,up,left — note the
  reference's `up` guard (`if (up < src) up = src`) is always true,
  so the up neighbor never contributes; ported faithfully.
* dodge (gstdodge.c): v' = 256v/(256-v) clamped.
* exclusion (gstexclusion.c:114): factor-((factor-v)^2/factor +
  (green*v)/factor) — including the reference's use of GREEN in the
  red/green cross terms.
* solarize (gstsolarize.c:114): triangle remap over
  [start, threshold, end] with C modulo semantics.
* gaussianblur (gstgaussblur.c): separable float32 gaussian over AYUV
  with edge-renormalized kernel sums and +0.5 truncation.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)
from ..video.info import VideoInfo

_RGBX_CAPS = ("video/x-raw, format={ BGRx, RGBx, RGBA, BGRA }, "
              "width=[1,32767], height=[1,32767], "
              "framerate=[0/1,2147483647/1]")
_AYUV_CAPS = ("video/x-raw, format=AYUV, width=[1,32767], "
              "height=[1,32767], framerate=[0/1,2147483647/1]")

# gstchromium.c:102-110 setup_cos_table: float32 radians with the
# reference's (typo'd) pi constant 3.141582f, cos() in double, *512
# truncated toward zero
_REF_PI = np.float32(3.141582)
COS_TABLE = np.array(
    [int(math.cos(float((np.float32(a) / np.float32(512))
                        * _REF_PI)) * 512)
     for a in range(1024)], np.int64)


class _GaudiBase(TransformElement):
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, _RGBX_CAPS),
        PadTemplate("src", PadDirection.SRC, _RGBX_CAPS),
    ]

    def set_info(self, incaps, outcaps):
        self._info = VideoInfo.from_caps_structure(incaps[0])

    def _rgb_map(self, fn3):
        """Build a plane fn applying fn3 to (R,G,B) int64 planes."""
        def fn(planes):
            import jax.numpy as jnp
            r, g, b = (p.astype(jnp.int64) for p in planes[:3])
            ro, go, bo = fn3(jnp, r, g, b)
            dt = planes[0].dtype
            out = [ro.astype(dt), go.astype(dt), bo.astype(dt)]
            return out + list(planes[3:])
        return fn


@register_element
class Burn(_GaudiBase):
    FACTORY = "burn"
    DESCRIPTION = "Burn adjusts the colors in the video signal"
    PROPERTIES = {"adjustment": (int, 175, "adjustment 0-256")}

    def make_fn(self):
        adj = self.props["adjustment"]

        def burn1(jnp, v):
            a = ((v + adj) & 0xFFFF) >> 1
            t = ((255 - v) << 7).astype(jnp.int64)
            q = jnp.where(a == 0, 0xFFFF, t // jnp.maximum(a, 1))
            return (255 - q) & 0xFF

        return self._rgb_map(
            lambda jnp, r, g, b: (burn1(jnp, r), burn1(jnp, g),
                                  burn1(jnp, b)))


@register_element
class Chromium(_GaudiBase):
    FACTORY = "chromium"
    DESCRIPTION = "Chromium breaks the colors of the video signal"
    PROPERTIES = {"edge-a": (int, 200, "first edge parameter 0-256"),
                  "edge-b": (int, 1, "second edge parameter 0-256")}

    def make_fn(self):
        ea, eb = self.props["edge-a"], self.props["edge-b"]
        tab = COS_TABLE

        def chrom1(jnp, v):
            angle = (v + ea + (v * eb) // 2) & 1023
            c = jnp.abs(jnp.asarray(tab)[angle])
            return jnp.clip(c, 0, 255)

        return self._rgb_map(
            lambda jnp, r, g, b: (chrom1(jnp, r), chrom1(jnp, g),
                                  chrom1(jnp, b)))


@register_element
class Dodge(_GaudiBase):
    FACTORY = "dodge"
    DESCRIPTION = "Dodge saturates the colors in the video signal"
    PROPERTIES = {}

    def make_fn(self):
        def dodge1(jnp, v):
            return jnp.clip((256 * v) // (256 - v), 0, 255)

        return self._rgb_map(
            lambda jnp, r, g, b: (dodge1(jnp, r), dodge1(jnp, g),
                                  dodge1(jnp, b)))


@register_element
class Exclusion(_GaudiBase):
    FACTORY = "exclusion"
    DESCRIPTION = "Exclusion exclodes the colors in the video signal"
    PROPERTIES = {"factor": (int, 175, "exclusion factor 1-175")}

    def make_fn(self):
        f = self.props["factor"]

        def fn3(jnp, r, g, b):
            # the reference's cross terms use GREEN for red and green
            ro = f - (((f - r) * (f - r)) // f + (g * r) // f)
            go = f - (((f - g) * (f - g)) // f + (g * g) // f)
            bo = f - (((f - b) * (f - b)) // f + (b * b) // f)
            return (jnp.clip(ro, 0, 255), jnp.clip(go, 0, 255),
                    jnp.clip(bo, 0, 255))

        return self._rgb_map(fn3)


@register_element
class Solarize(_GaudiBase):
    FACTORY = "solarize"
    DESCRIPTION = "Solarize tunable inverse in the video signal"
    PROPERTIES = {"threshold": (int, 127, "0-256"),
                  "start": (int, 50, "0-256"),
                  "end": (int, 185, "0-256")}

    def make_fn(self):
        thr, start, end = (self.props["threshold"],
                           self.props["start"], self.props["end"])
        period = (end - start) if end != start else 1
        up_len = (thr - start) if thr != start else 1
        down_len = (end - thr) if thr != end else 1

        def sol1(jnp, v):
            # C %: dividend v+256-start >= 0 when start <= 256
            param = (v + 256 - start) % period if period > 0 else \
                -((-(v + 256 - start)) % -period)
            up = (param * 255) // up_len
            down = ((down_len - (param - up_len)) * 255) // down_len
            out = jnp.where(param < up_len, up, down)
            # C: guint color; only the >255 side is clamped
            return jnp.minimum(out & 0xFFFFFFFF, 255)

        return self._rgb_map(
            lambda jnp, r, g, b: (sol1(jnp, r), sol1(jnp, g),
                                  sol1(jnp, b)))


@register_element
class Dilate(_GaudiBase):
    FACTORY = "dilate"
    DESCRIPTION = "Dilate copies the brightest pixel around"
    PROPERTIES = {"erode": (bool, False, "take the darkest instead")}

    def make_fn(self):
        erode = self.props["erode"]

        def fn(planes):
            import jax.numpy as jnp
            r, g, b = (p.astype(jnp.int64) for p in planes[:3])
            lum = 90 * r + 115 * g + 51 * b

            def shift(x, dr, dc, fill_self):
                # neighbor with self-fill at the frame edge
                if dr == 1:        # down: self on the last row
                    y = jnp.concatenate([x[..., 1:, :],
                                         fill_self[..., -1:, :]],
                                        axis=-2)
                elif dr == -1:     # up (never used; kept for clarity)
                    y = jnp.concatenate([fill_self[..., :1, :],
                                         x[..., :-1, :]], axis=-2)
                elif dc == 1:      # right: self on the last column
                    y = jnp.concatenate([x[..., :, 1:],
                                         fill_self[..., :, -1:]],
                                        axis=-1)
                else:              # left: self on the first column
                    y = jnp.concatenate([fill_self[..., :, :1],
                                         x[..., :, :-1]], axis=-1)
                return y

            cur = [r, g, b, lum]
            # candidate order: down, right, (up: reference bug makes
            # it always self -> no-op), left.  The left step does not
            # update the luminance in the C code, but it is last.
            for dr, dc in ((1, 0), (0, 1), (0, -1)):
                nl = shift(lum, dr, dc, lum)
                nr = shift(r, dr, dc, r)
                ng = shift(g, dr, dc, g)
                nb = shift(b, dr, dc, b)
                take = (nl < cur[3]) if erode else (nl > cur[3])
                cur = [jnp.where(take, nr, cur[0]),
                       jnp.where(take, ng, cur[1]),
                       jnp.where(take, nb, cur[2]),
                       jnp.where(take, nl, cur[3])]
            dt = planes[0].dtype
            return [cur[0].astype(dt), cur[1].astype(dt),
                    cur[2].astype(dt)] + list(planes[3:])

        return fn


@register_element
class GaussianBlur(TransformElement):
    FACTORY = "gaussianblur"
    DESCRIPTION = "Perform Gaussian blur/sharpen on a video"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, _AYUV_CAPS),
        PadTemplate("src", PadDirection.SRC, _AYUV_CAPS),
    ]
    PROPERTIES = {"sigma": (float, 1.2, "blur (>0) / sharpen (<0)")}

    def set_info(self, incaps, outcaps):
        self._info = VideoInfo.from_caps_structure(incaps[0])

    def make_fn(self):
        sigma = self.props["sigma"]
        if sigma == 0.0:
            return None
        # make_gaussian_kernel (gstgaussblur.c): float32 math
        fs = np.float32(sigma)
        center = int(math.ceil(2.5 * abs(float(fs))))
        win = 1 + 2 * center
        if win == 1:
            kernel = np.ones(1, np.float32)
        else:
            fe = np.float32(-0.5) / (fs * fs)
            dx = np.float32(1.0) / (fs * np.float32(math.sqrt(
                2 * math.pi)))
            kernel = np.empty(win, np.float32)
            kernel[center] = dx
            for i in range(1, center + 1):
                fx = dx * np.float32(math.e) ** (fe * i * i)
                kernel[center + i] = kernel[center - i] = fx
        ksum = np.cumsum(kernel, dtype=np.float32)

        def blur_axis(jnp, x, axis):
            n = x.shape[axis]
            pad = [(0, 0)] * x.ndim
            pad[axis] = (center, center)
            xp = jnp.pad(x, pad)
            acc = None
            for k in range(win):
                sl = [slice(None)] * x.ndim
                sl[axis] = slice(k, k + n)
                term = xp[tuple(sl)] * jnp.float32(kernel[k])
                acc = term if acc is None else acc + term
            # edge renormalization: divide by the sum of in-range taps
            idx = jnp.arange(n)
            kmin = jnp.maximum(0, center - idx)
            kmax = jnp.minimum(win, n - (idx - center))
            s = (jnp.asarray(ksum)[kmax - 1]
                 - jnp.where(kmin > 0,
                             jnp.asarray(ksum)[jnp.maximum(
                                 kmin - 1, 0)], 0.0))
            shape = [1] * x.ndim
            shape[axis] = n
            return acc / s.reshape(shape)

        def fn(planes):
            import jax.numpy as jnp
            outs = []
            for p in planes:
                x = p.astype(jnp.float32)
                x = blur_axis(jnp, x, axis=x.ndim - 1)   # rows
                x = blur_axis(jnp, x, axis=x.ndim - 2)   # columns
                outs.append(jnp.clip(x + 0.5, 0, 255)
                            .astype(jnp.uint8).astype(p.dtype))
            return outs

        return fn
