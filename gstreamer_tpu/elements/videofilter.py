"""Video filter family: videobalance, gamma, videoflip, videocrop,
videobox, videomedian, alpha.

References (gst-plugins-good/gst/videofilter/ and friends):
* videobalance — gstvideobalance.c:114-144: Y LUT
  y' = clamp(rint(16 + (y-16)*contrast + brightness*255)); U/V via hue
  rotation u' = 128 + ((u-128)cos(pi*hue) + (v-128)sin(pi*hue))*saturation
  (256x256 LUTs; we precompute the same tables and gather on device)
* gamma — gst-plugins-good/gst/videofilter/gstgamma.c: 256-entry LUT
  y' = rint(pow(i/255, 1/gamma)*255) applied to luma
* videoflip — gstvideoflip.c: 8 methods incl. 90l/90r/180/transpose;
  caps transform swaps width/height for the 90-degree methods
* videocrop/videobox — gst-plugins-good/gst/videocrop, gst/videobox
* videomedian — gstvideomedian.c: 5-point cross median on planes
* alpha — gst-plugins-good/gst/alpha: alpha set mode (chroma keying in a
  later round)
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)
from ..core.value import IntRange
from ..video.format import pack, unpack
from ..video.info import VideoInfo
from .videotestsrc import FORMAT_LIST

YUV_CAPS = ("video/x-raw, format={ AYUV, I420, YV12, Y444, Y42B, Y41B, "
            "NV12, NV21, YUY2, UYVY, VUYA }, width=[1,32767], "
            "height=[1,32767], framerate=[0/1,2147483647/1]")
ANY_VIDEO = (f"video/x-raw, format={FORMAT_LIST}, width=[1,32767], "
             f"height=[1,32767], framerate=[0/1,2147483647/1]")


class _VideoFilterBase(TransformElement):
    """GstVideoFilter equivalent: same caps in/out, per-frame function."""

    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, YUV_CAPS),
        PadTemplate("src", PadDirection.SRC, YUV_CAPS),
    ]

    def set_info(self, incaps, outcaps):
        self._info = VideoInfo.from_caps_structure(incaps[0])


@register_element
class VideoBalance(_VideoFilterBase):
    FACTORY = "videobalance"
    DESCRIPTION = "Adjusts brightness, contrast, hue, saturation"
    PROPERTIES = {
        "contrast": (float, 1.0, "[0,2]"),
        "brightness": (float, 0.0, "[-1,1]"),
        "hue": (float, 0.0, "[-1,1]"),
        "saturation": (float, 1.0, "[0,2]"),
    }
    DYNAMIC_PROPS = ("contrast", "brightness", "hue", "saturation")

    def make_dyn_fn(self):
        """Keyframed balance: the four scalars arrive as per-tick
        device inputs and the LUTs are built ON DEVICE each tick with
        the same rint/clip math as the static tables — identical
        output, no recompiles."""

        def fn(planes, dyn):
            import jax.numpy as jnp
            c = dyn.get("contrast", jnp.float32(self.props["contrast"]))
            b = dyn.get("brightness",
                        jnp.float32(self.props["brightness"]))
            hue = dyn.get("hue", jnp.float32(self.props["hue"]))
            sat = dyn.get("saturation",
                          jnp.float32(self.props["saturation"]))
            i = jnp.arange(256, dtype=jnp.float32)
            ty = jnp.clip(jnp.rint(16 + (i - 16) * c + b * 255),
                          0, 255).astype(jnp.int32)
            hc = jnp.cos(jnp.pi * hue)
            hs = jnp.sin(jnp.pi * hue)
            ii = (jnp.arange(256, dtype=jnp.float32)
                  - 128)[:, None]
            jj = (jnp.arange(256, dtype=jnp.float32)
                  - 128)[None, :]
            tu = jnp.clip(jnp.rint(128 + (ii * hc + jj * hs) * sat),
                          0, 255).astype(jnp.int32).reshape(-1)
            tv = jnp.clip(jnp.rint(128 + (-ii * hs + jj * hc) * sat),
                          0, 255).astype(jnp.int32).reshape(-1)
            y = planes[0].astype(jnp.int32)
            u = planes[1].astype(jnp.int32)
            v = planes[2].astype(jnp.int32)
            idx = u * 256 + v
            out = [ty[y].astype(jnp.uint8),
                   tu[idx].astype(jnp.uint8),
                   tv[idx].astype(jnp.uint8)]
            return tuple(out) + tuple(planes[3:])

        return fn

    def _tables(self):
        c, b = self.props["contrast"], self.props["brightness"]
        hue, sat = self.props["hue"], self.props["saturation"]
        i = np.arange(256, dtype=np.float64)
        tabley = np.clip(np.rint(16 + (i - 16) * c + b * 255), 0, 255)
        hc, hs = math.cos(math.pi * hue), math.sin(math.pi * hue)
        ii, jj = np.mgrid[-128:128, -128:128].astype(np.float64)
        tableu = np.clip(np.rint(128 + (ii * hc + jj * hs) * sat), 0, 255)
        tablev = np.clip(np.rint(128 + (-ii * hs + jj * hc) * sat), 0, 255)
        return (tabley.astype(np.int32), tableu.astype(np.int32),
                tablev.astype(np.int32))

    def _f32_direct_ok(self, ty, tu, tv):
        """The LUTs are pure affine maps of the pixel value; direct
        per-pixel float32 evaluation is ~50x faster than TPU gathers.
        Verify at trace time that f32 arithmetic reproduces every
        entry of the float64-built tables (rint ties can differ in
        principle); fall back to the gather path if any differs."""
        c = np.float32(self.props["contrast"])
        b255 = np.float32(self.props["brightness"] * 255.0)
        hue, sat = self.props["hue"], self.props["saturation"]
        hcs = np.float32(math.cos(math.pi * hue) * sat)
        hss = np.float32(math.sin(math.pi * hue) * sat)
        i = np.arange(256, dtype=np.float32)
        ty2 = np.clip(np.rint(np.float32(16) + (i - np.float32(16))
                              * c + b255), 0, 255).astype(np.int32)
        ii, jj = np.mgrid[-128:128, -128:128].astype(np.float32)
        tu2 = np.clip(np.rint(np.float32(128) + ii * hcs + jj * hss),
                      0, 255).astype(np.int32)
        tv2 = np.clip(np.rint(np.float32(128) - ii * hss + jj * hcs),
                      0, 255).astype(np.int32)
        ok = (np.array_equal(ty2, ty) and np.array_equal(tu2, tu)
              and np.array_equal(tv2, tv))
        return ok, (c, b255, hcs, hss)

    def make_fn(self):
        if (self.props["contrast"] == 1.0 and self.props["brightness"] == 0.0
                and self.props["hue"] == 0.0 and self.props["saturation"] == 1.0):
            return None
        ty, tu, tv = self._tables()
        direct_ok, consts = self._f32_direct_ok(ty, tu, tv)
        info = self._info
        fmt = info.finfo

        if direct_ok:
            c, b255, hcs, hss = (float(v) for v in consts)

            def fn(planes):
                import jax.numpy as jnp
                yf = planes[0].astype(jnp.float32)
                uf = planes[1].astype(jnp.float32) - 128.0
                vf = planes[2].astype(jnp.float32) - 128.0
                y2 = jnp.clip(jnp.rint(16.0 + (yf - 16.0) * c + b255),
                              0, 255)
                u2 = jnp.clip(jnp.rint(128.0 + uf * hcs + vf * hss),
                              0, 255)
                v2 = jnp.clip(jnp.rint(128.0 - uf * hss + vf * hcs),
                              0, 255)
                out = [y2.astype(jnp.uint8), u2.astype(jnp.uint8),
                       v2.astype(jnp.uint8)]
                return tuple(out) + tuple(planes[3:])

            return fn

        def fn(planes):
            import jax.numpy as jnp
            ty_j = jnp.asarray(ty)
            tuv_j = jnp.asarray(np.stack([tu, tv]).reshape(2, -1))
            y = planes[0].astype(jnp.int32)
            u = planes[1].astype(jnp.int32)
            v = planes[2].astype(jnp.int32)
            y2 = ty_j[y]
            idx = u * 256 + v
            u2 = tuv_j[0][idx]
            v2 = tuv_j[1][idx]
            out = [y2.astype(jnp.uint8), u2.astype(jnp.uint8),
                   v2.astype(jnp.uint8)]
            return tuple(out) + tuple(planes[3:])

        return fn


@register_element
class Gamma(_VideoFilterBase):
    FACTORY = "gamma"
    DESCRIPTION = "Adjusts gamma on video luma"
    PROPERTIES = {"gamma": (float, 1.0, "gamma value")}

    def make_fn(self):
        g = self.props["gamma"]
        if g == 1.0:
            return None
        i = np.arange(256, dtype=np.float64)
        lut = np.clip(np.rint(np.power(i / 255.0, 1.0 / g) * 255.0),
                      0, 255).astype(np.int32)

        def fn(planes):
            import jax.numpy as jnp
            lut_j = jnp.asarray(lut)
            y = lut_j[planes[0].astype(jnp.int32)].astype(jnp.uint8)
            return (y,) + tuple(planes[1:])

        return fn


@register_element
class VideoFlip(TransformElement):
    FACTORY = "videoflip"
    DESCRIPTION = "Flips and rotates video"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, ANY_VIDEO),
        PadTemplate("src", PadDirection.SRC, ANY_VIDEO),
    ]
    PROPERTIES = {"method": (str, "none",
                             "none|clockwise|rotate-180|counterclockwise|"
                             "horizontal-flip|vertical-flip|"
                             "upper-left-diagonal|upper-right-diagonal")}

    SWAPS = ("clockwise", "counterclockwise", "upper-left-diagonal",
             "upper-right-diagonal")

    def transform_caps(self, direction, caps, filter=None):
        out = []
        for s in caps:
            ns = s.copy()
            if self.props["method"] in self.SWAPS:
                w, h = ns.get("width"), ns.get("height")
                if w is not None and h is not None:
                    ns["width"], ns["height"] = h, w
            out.append(ns)
        res = Caps(out)
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        self._in = VideoInfo.from_caps_structure(incaps[0])

    def make_fn(self):
        method = self.props["method"]
        if method == "none":
            return None

        def op(p):
            if method == "vertical-flip":
                return p[..., ::-1, :]
            if method == "horizontal-flip":
                return p[..., :, ::-1]
            if method == "rotate-180":
                return p[..., ::-1, ::-1]
            if method == "clockwise":
                return p.swapaxes(-1, -2)[..., :, ::-1]
            if method == "counterclockwise":
                return p.swapaxes(-1, -2)[..., ::-1, :]
            if method == "upper-left-diagonal":
                return p.swapaxes(-1, -2)
            if method == "upper-right-diagonal":
                return p.swapaxes(-1, -2)[..., ::-1, ::-1]
            return p

        return lambda planes: tuple(op(p) for p in planes)


@register_element
class VideoCrop(TransformElement):
    FACTORY = "videocrop"
    DESCRIPTION = "Crops video"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, ANY_VIDEO),
        PadTemplate("src", PadDirection.SRC, ANY_VIDEO),
    ]
    PROPERTIES = {
        "top": (int, 0, ""), "bottom": (int, 0, ""),
        "left": (int, 0, ""), "right": (int, 0, ""),
    }

    def transform_caps(self, direction, caps, filter=None):
        dw = self.props["left"] + self.props["right"]
        dh = self.props["top"] + self.props["bottom"]
        out = []
        for s in caps:
            ns = s.copy()
            for key, delta in (("width", dw), ("height", dh)):
                v = ns.get(key)
                if isinstance(v, int):
                    ns[key] = v - delta if direction == PadDirection.SINK \
                        else v + delta
            out.append(ns)
        res = Caps(out)
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        self._in = VideoInfo.from_caps_structure(incaps[0])

    def make_fn(self):
        t, b = self.props["top"], self.props["bottom"]
        l, r = self.props["left"], self.props["right"]
        if not any((t, b, l, r)):
            return None
        info = self._in
        fmt = info.finfo

        def fn(planes):
            out = []
            for c, p in enumerate(planes):
                hs = fmt.h_sub[c] if c < len(fmt.h_sub) else 0
                ws = fmt.w_sub[c] if c < len(fmt.w_sub) else 0
                tt, bb = t >> hs, b >> hs
                ll, rr = l >> ws, r >> ws
                sl_h = slice(tt, p.shape[-2] - bb if bb else None)
                sl_w = slice(ll, p.shape[-1] - rr if rr else None)
                out.append(p[..., sl_h, sl_w])
            return tuple(out)

        return fn


@register_element
class VideoBox(TransformElement):
    """videobox: negative values add borders, positive crop."""
    FACTORY = "videobox"
    DESCRIPTION = "Resizes video by adding borders or cropping"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, YUV_CAPS),
        PadTemplate("src", PadDirection.SRC, YUV_CAPS),
    ]
    PROPERTIES = {
        "top": (int, 0, ""), "bottom": (int, 0, ""),
        "left": (int, 0, ""), "right": (int, 0, ""),
        "fill": (str, "black", "black|green|blue"),
    }

    def transform_caps(self, direction, caps, filter=None):
        dw = self.props["left"] + self.props["right"]
        dh = self.props["top"] + self.props["bottom"]
        out = []
        for s in caps:
            ns = s.copy()
            for key, delta in (("width", dw), ("height", dh)):
                v = ns.get(key)
                if isinstance(v, int):
                    ns[key] = v - delta if direction == PadDirection.SINK \
                        else v + delta
            out.append(ns)
        res = Caps(out)
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        self._in = VideoInfo.from_caps_structure(incaps[0])

    def make_fn(self):
        t, b = self.props["top"], self.props["bottom"]
        l, r = self.props["left"], self.props["right"]
        if not any((t, b, l, r)):
            return None
        info = self._in
        fmt = info.finfo
        fill = {"black": (16, 128, 128), "green": (145, 54, 34),
                "blue": (41, 240, 110)}[self.props["fill"]]

        def fn(planes):
            import jax.numpy as jnp
            out = []
            for c, p in enumerate(planes[:3]):
                hs = fmt.h_sub[c] if c < len(fmt.h_sub) else 0
                ws = fmt.w_sub[c] if c < len(fmt.w_sub) else 0
                tt, bb = t >> hs, b >> hs
                ll, rr = l >> ws, r >> ws
                # crop positive
                sl_h = slice(max(tt, 0), p.shape[-2] - max(bb, 0) or None)
                sl_w = slice(max(ll, 0), p.shape[-1] - max(rr, 0) or None)
                q = p[..., sl_h, sl_w]
                pads = [(0, 0)] * (q.ndim - 2) + [
                    (max(-tt, 0), max(-bb, 0)), (max(-ll, 0), max(-rr, 0))]
                q = jnp.pad(q, pads, constant_values=fill[c])
                out.append(q)
            return tuple(out) + tuple(planes[3:])

        return fn


@register_element
class VideoMedian(_VideoFilterBase):
    FACTORY = "videomedian"
    DESCRIPTION = "Apply a median filter to video"
    PROPERTIES = {"filtersize": (int, 5, "5 or 9"),
                  "lum-only": (bool, True, "")}

    def make_fn(self):
        size = self.props["filtersize"]
        lum_only = self.props["lum-only"]

        def median5(p):
            import jax.numpy as jnp
            # 5-point cross median (gstvideomedian.c median5)
            pi = p.astype(jnp.int32)
            up = jnp.roll(pi, 1, axis=-2)
            down = jnp.roll(pi, -1, axis=-2)
            left = jnp.roll(pi, 1, axis=-1)
            right = jnp.roll(pi, -1, axis=-1)
            st = jnp.stack([pi, up, down, left, right], axis=0)
            med = jnp.median(st, axis=0).astype(p.dtype)
            # borders copied unchanged (reference keeps edges)
            med = med.at[..., 0, :].set(p[..., 0, :])
            med = med.at[..., -1, :].set(p[..., -1, :])
            med = med.at[..., :, 0].set(p[..., :, 0])
            med = med.at[..., :, -1].set(p[..., :, -1])
            return med

        def fn(planes):
            out = [median5(planes[0])]
            for p in planes[1:]:
                out.append(p if lum_only else median5(p))
            return tuple(out)

        return fn


@register_element
class Alpha(TransformElement):
    """alpha element: add/set alpha channel (chroma keying basic)."""
    FACTORY = "alpha"
    DESCRIPTION = "Adds an alpha channel to video"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, YUV_CAPS),
        PadTemplate("src", PadDirection.SRC,
                    "video/x-raw, format={ AYUV, ARGB, BGRA, RGBA }, "
                    "width=[1,32767], height=[1,32767], "
                    "framerate=[0/1,2147483647/1]"),
    ]
    PROPERTIES = {
        "alpha": (float, 1.0, "alpha value"),
        "method": (str, "set", "set|green|blue|custom"),
        "angle": (float, 20.0, "chroma-key tolerance (degrees)"),
    }

    def transform_caps(self, direction, caps, filter=None):
        tmpl = (self.src_pads()[0].template_caps
                if direction == PadDirection.SINK
                else self.sink_pads()[0].template_caps)
        out = []
        for s in caps:
            for ts in tmpl:
                ns = ts.copy()
                for k in ("width", "height", "framerate"):
                    if k in s.fields:
                        ns[k] = s[k]
                out.append(ns)
        res = Caps(out).simplify()
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        self._in = VideoInfo.from_caps_structure(incaps[0])
        self._out = VideoInfo.from_caps_structure(outcaps[0])

    def make_fn(self):
        alpha = self.props["alpha"]
        method = self.props["method"]
        iinfo, oinfo = self._in, self._out
        ifmt, ofmt = iinfo.finfo, oinfo.finfo
        # key colors in YUV (green/blue screen, bt601 values)
        key = {"green": (145, 54, 34), "blue": (41, 240, 110)}.get(method)

        from ..video.converter import VideoConverter
        conv = None
        if ifmt.name != ofmt.name:
            conv = VideoConverter(
                VideoInfo(format=iinfo.format, width=iinfo.width,
                          height=iinfo.height, colorimetry=iinfo.colorimetry),
                VideoInfo(format=oinfo.format, width=oinfo.width,
                          height=oinfo.height))
            conv_fn = conv.trace_fn()

        def fn(planes):
            import jax.numpy as jnp
            a_val = int(alpha * 255)
            if key is not None:
                y = planes[0].astype(jnp.int32)
                u_full = planes[1]
                v_full = planes[2]
                # distance to key chroma at chroma resolution
                du = u_full.astype(jnp.int32) - key[1]
                dv = v_full.astype(jnp.int32) - key[2]
                dist2 = du * du + dv * dv
                tol = (self.props["angle"] * 3) ** 2
                a_chroma = jnp.where(dist2 < tol, 0, a_val).astype(jnp.uint8)
                # upsample alpha (nearest) to full res
                rep_h = y.shape[-2] // a_chroma.shape[-2]
                rep_w = y.shape[-1] // a_chroma.shape[-1]
                a_plane = jnp.repeat(jnp.repeat(a_chroma, rep_h, axis=-2),
                                     rep_w, axis=-1)[..., :y.shape[-2], :y.shape[-1]]
            else:
                a_plane = jnp.full(planes[0].shape, a_val, jnp.uint8)
            if conv is not None:
                outp = conv_fn(planes)
            else:
                outp = planes
            return tuple(outp[:3]) + (a_plane,)

        return fn
