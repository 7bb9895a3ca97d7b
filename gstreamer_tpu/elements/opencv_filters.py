"""OpenCV-analog video-analysis filters (pure image DSP).

Clean-room, TPU-first rebuilds of the reference's opencv plugin
elements (gst-plugins-bad/ext/opencv/gstopencv.cpp:56-77).  Each
element is a fused device function over canonical component planes —
the morphology/convolution/histogram math lives in
ops/cv_kernels.py, which is pinned bit-exactly (or with documented
+-1/border tolerances) against the system OpenCV oracle in
tests/test_opencv_filters.py.

Elements in this module (reference file cited per class):
  cvdilate / cverode        gstcvdilate.cpp / gstcverode.cpp
  cvequalizehist            gstcvequalizehist.cpp
  cvsobel                   gstcvsobel.cpp
  cvlaplace                 gstcvlaplace.cpp
  cvsmooth                  gstcvsmooth.cpp
  edgedetect                gstedgedetect.cpp (cv::Canny)
  skindetect                gstskindetect.cpp
  retinex                   gstretinex.cpp (basic + multiscale)
  opencvtextoverlay         gsttextoverlay.cpp (PIL rasterizer
                            instead of the Hershey vector font —
                            documented reduction; position/color/
                            thickness semantics preserved)

The detection/stateful half of the family (segmentation, motioncells,
templatematch, cvtracker, grabcut, disparity, dewarp, camera*) lives
in opencv_analysis.py / opencv_camera.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.buffer import Buffer
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)
from ..ops import cv_kernels as cvk
from ..video.info import VideoInfo

RGB_CAPS = ("video/x-raw, format=RGB, width=[1,32767], "
            "height=[1,32767], framerate=[0/1,2147483647/1]")
GRAY_CAPS = ("video/x-raw, format=GRAY8, width=[1,32767], "
             "height=[1,32767], framerate=[0/1,2147483647/1]")
RGB_OR_GRAY_CAPS = ("video/x-raw, format={ RGB, GRAY8 }, "
                    "width=[1,32767], height=[1,32767], "
                    "framerate=[0/1,2147483647/1]")


class _CvFilterBase(TransformElement):
    """Shared scaffold: fixed-format device filter over planes."""

    CAPS = RGB_CAPS
    PAD_TEMPLATES = None  # filled by __init_subclass__

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        if cls.PAD_TEMPLATES is None:
            cls.PAD_TEMPLATES = [
                PadTemplate("sink", PadDirection.SINK, cls.CAPS),
                PadTemplate("src", PadDirection.SRC, cls.CAPS),
            ]

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._info: Optional[VideoInfo] = None

    def set_info(self, incaps, outcaps):
        if incaps is not None:
            self._info = VideoInfo.from_caps_structure(incaps[0])


def _mask_or_map(jnp, planes, edge_u8, mask: bool):
    """The edgedetect/cvsobel/cvlaplace output convention:
    outimg zeroed, then either img.copyTo(out, edge) (mask=True) or
    GRAY2RGB of the edge map (mask=False)."""
    if mask:
        nz = edge_u8 != 0
        return [jnp.where(nz, p, jnp.uint8(0)) for p in planes[:3]]
    return [edge_u8, edge_u8, edge_u8]


@register_element
class CvDilate(_CvFilterBase):
    """cvdilate (gstcvdilate.cpp): cv::dilate, default 3x3 kernel."""
    FACTORY = "cvdilate"
    DESCRIPTION = "Applies cvDilate OpenCV function to the image"
    CAPS = RGB_OR_GRAY_CAPS
    PROPERTIES = {"iterations": (int, 1, "number of iterations")}

    _OP = staticmethod(cvk.dilate_u8)

    def make_fn(self):
        iters = int(self.props["iterations"])
        op = self._OP

        def fn(planes):
            import jax.numpy as jnp
            return [op(jnp, p, iters) for p in planes]

        return fn


@register_element
class CvErode(CvDilate):
    """cverode (gstcverode.cpp): cv::erode, default 3x3 kernel."""
    FACTORY = "cverode"
    DESCRIPTION = "Applies cvErode OpenCV function to the image"

    _OP = staticmethod(cvk.erode_u8)


@register_element
class CvEqualizeHist(_CvFilterBase):
    """cvequalizehist (gstcvequalizehist.cpp): cv::equalizeHist on
    GRAY8."""
    FACTORY = "cvequalizehist"
    DESCRIPTION = "Applies cvEqualizeHist OpenCV function to the image"
    CAPS = GRAY_CAPS
    PROPERTIES = {}

    def make_fn(self):
        def fn(planes):
            import jax.numpy as jnp
            return [cvk.equalize_hist_u8(jnp, planes[0])]

        return fn


@register_element
class CvSobel(_CvFilterBase):
    """cvsobel (gstcvsobel.cpp): RGB -> gray -> cv::Sobel(CV_8U) ->
    masked original or GRAY2RGB edge map."""
    FACTORY = "cvsobel"
    DESCRIPTION = "Applies cvSobel OpenCV function to the image"
    PROPERTIES = {
        "x-order": (int, 1, "order of the derivative x"),
        "y-order": (int, 0, "order of the derivative y"),
        "aperture-size": (int, 3, "size of the extended Sobel kernel "
                                  "(1, 3, 5 or 7)"),
        "mask": (bool, True, "sets whether the detected edges should "
                             "be used as a mask on the original input"),
    }

    def make_fn(self):
        dx = max(int(self.props["x-order"]), 0)
        dy = max(int(self.props["y-order"]), 0)
        ap = int(self.props["aperture-size"])
        mask = bool(self.props["mask"])
        if ap not in (1, 3, 5, 7):
            raise ValueError("aperture-size must be 1, 3, 5 or 7")
        if dx + dy == 0:
            dx = 1

        def fn(planes):
            import jax.numpy as jnp
            gray = cvk.rgb2gray_u8(jnp, *planes[:3])
            edge = cvk.sobel_u8(jnp, gray, dx, dy, ap)
            return _mask_or_map(jnp, planes, edge, mask)

        return fn


@register_element
class CvLaplace(_CvFilterBase):
    """cvlaplace (gstcvlaplace.cpp): gray -> cv::Laplacian(CV_8U) ->
    convertTo(scale, shift) -> masked original or edge map."""
    FACTORY = "cvlaplace"
    DESCRIPTION = "Applies cvLaplace OpenCV function to the image"
    PROPERTIES = {
        "aperture-size": (int, 3, "size of the extended Laplace kernel "
                                  "(1, 3, 5 or 7)"),
        "scale": (float, 1.0, "scale factor"),
        "shift": (float, 0.0, "added to the scaled values"),
        "mask": (bool, True, "use the detected edges as a mask"),
    }

    def make_fn(self):
        ap = int(self.props["aperture-size"])
        scale = float(self.props["scale"])
        shift = float(self.props["shift"])
        mask = bool(self.props["mask"])
        if ap not in (1, 3, 5, 7):
            raise ValueError("aperture-size must be 1, 3, 5 or 7")

        def fn(planes):
            import jax.numpy as jnp
            gray = cvk.rgb2gray_u8(jnp, *planes[:3])
            edge = cvk.laplacian_u8(jnp, gray, ap, scale, shift)
            return _mask_or_map(jnp, planes, edge, mask)

        return fn


@register_element
class CvSmooth(_CvFilterBase):
    """cvsmooth (gstcvsmooth.cpp): blur/gaussian/median/bilateral,
    optionally restricted to a rectangle (position-x/y, width,
    height); outside the rectangle the image passes through."""
    FACTORY = "cvsmooth"
    DESCRIPTION = "Applies cvSmooth OpenCV function to the image"
    CAPS = RGB_OR_GRAY_CAPS
    PROPERTIES = {
        "type": (str, "gaussian",
                 "smooth type: blur, gaussian, median, bilateral"),
        "kernel-width": (int, 3, "gaussian/box kernel width (median: "
                                 "aperture size)"),
        "kernel-height": (int, 3, "gaussian/box kernel height"),
        "color": (float, 0.0, "gaussian standard deviation or "
                              "bilateral color sigma"),
        "spatial": (float, 0.0, "bilateral spatial sigma"),
        "position-x": (int, 0, "starting x position for blur"),
        "position-y": (int, 0, "starting y position for blur"),
        "width": (int, 2147483647, "width of area to blur"),
        "height": (int, 2147483647, "height of area to blur"),
    }

    def make_fn(self):
        typ = self.props["type"]
        kw = int(self.props["kernel-width"])
        kh = int(self.props["kernel-height"]) or kw
        color = float(self.props["color"])
        spatial = float(self.props["spatial"])
        px, py = int(self.props["position-x"]), int(self.props["position-y"])
        rw, rh = int(self.props["width"]), int(self.props["height"])
        info = self._info
        full = (px == 0 and py == 0 and rw == 2147483647
                and rh == 2147483647)

        def smooth(jnp, planes):
            if typ == "blur":
                return [cvk.box_blur_u8(jnp, p, kw, kh) for p in planes]
            if typ == "gaussian":
                return [cvk.gaussian_blur_u8(jnp, p, kw, sigma=color,
                                             ksize_y=kh, sigma_y=color)
                        for p in planes]
            if typ == "median":
                return [cvk.median_blur_u8(jnp, p, kw) for p in planes]
            if typ == "bilateral":
                return list(cvk.bilateral_u8(jnp, planes, color, 0.0))
            raise ValueError("unknown smooth type %r" % (typ,))

        def fn(planes):
            import jax.numpy as jnp
            if full:
                return smooth(jnp, list(planes))
            w, h = info.width, info.height
            # effect starting outside the image, or an empty area:
            # passthrough (gstcvsmooth.cpp transform_ip guards)
            if px >= w or py >= h or rw <= 0 or rh <= 0:
                return list(planes)
            x1, y1 = px, py
            x2 = min(px + rw, w)
            y2 = min(py + rh, h)
            # smooth the ROI slice exactly like the reference's
            # submatrix call (borders reflect within the ROI)
            out = []
            sub = [p[..., y1:y2, x1:x2] for p in planes]
            ssub = smooth(jnp, sub)
            for p, s in zip(planes, ssub):
                patched = p.at[..., y1:y2, x1:x2].set(s) \
                    if hasattr(p, "at") else _np_patch(p, s, y1, y2,
                                                       x1, x2)
                out.append(patched)
            return out

        return fn


def _np_patch(p, s, y1, y2, x1, x2):
    out = np.array(p, copy=True)
    out[..., y1:y2, x1:x2] = s
    return out


@register_element
class EdgeDetect(_CvFilterBase):
    """edgedetect (gstedgedetect.cpp): gray -> cv::Canny ->
    masked original or GRAY2RGB edge map."""
    FACTORY = "edgedetect"
    DESCRIPTION = "Performs canny edge detection on videos and images"
    PROPERTIES = {
        "threshold1": (int, 50, "threshold value for canny detection"),
        "threshold2": (int, 150, "second threshold value for canny "
                                 "detection"),
        "aperture": (int, 3, "aperture size for Sobel operator "
                             "(3, 5 or 7)"),
        "mask": (bool, True, "use the detected edges as a mask on the "
                             "original input"),
    }

    def make_fn(self):
        t1 = int(self.props["threshold1"])
        t2 = int(self.props["threshold2"])
        ap = int(self.props["aperture"])
        mask = bool(self.props["mask"])
        if ap not in (3, 5, 7):
            raise ValueError("aperture must be 3, 5 or 7")

        def fn(planes):
            import jax.numpy as jnp
            gray = cvk.rgb2gray_u8(jnp, *planes[:3])
            edge = cvk.canny(jnp, gray, t1, t2, ap)
            return _mask_or_map(jnp, planes, edge, mask)

        return fn


@register_element
class SkinDetect(_CvFilterBase):
    """skindetect (gstskindetect.cpp): non-parametric skin detection;
    output is the black/white skin mask as RGB.

    hsv method: skin = (H>10) & (H<=20) & (S>48) & (V>80) with the hue
    mask eroded once first; rgb method: the R>60 / R' in (0.42,0.6] /
    G' in (0.28,0.4] chromaticity box.  postprocess applies
    erode-dilate(x2)-erode to build large connected blobs."""
    FACTORY = "skindetect"
    DESCRIPTION = "Performs non-parametric skin detection on input"
    PROPERTIES = {
        "postprocess": (bool, True, "apply opening-closing to extract "
                                    "large, significant blobs"),
        "method": (str, "hsv", "method to use: hsv or rgb"),
    }

    def make_fn(self):
        post = bool(self.props["postprocess"])
        method = self.props["method"]

        def fn(planes):
            import jax.numpy as jnp
            r, g, b = planes[:3]
            if method == "rgb":
                rf = r.astype(jnp.float32)
                gf = g.astype(jnp.float32)
                allf = rf + gf + b.astype(jnp.float32)
                safe = jnp.where(allf == 0, 1.0, allf)
                rp = jnp.where(allf == 0, 0.0, rf / safe)
                gp = jnp.where(allf == 0, 0.0, gf / safe)
                skin = ((rf > 60) & (rp > 0.42) & ~(rp > 0.6)
                        & (gp > 0.28) & ~(gp > 0.4))
                m = jnp.where(skin, jnp.uint8(255), jnp.uint8(0))
            else:
                h, s, v = cvk.rgb2hsv_u8(jnp, r, g, b)
                hlo = jnp.where(h > 10, jnp.uint8(255), jnp.uint8(0))
                hhi = jnp.where(h > 20, jnp.uint8(0), jnp.uint8(255))
                # the reference erodes the (hue < 20) mask once
                hhi = cvk.erode_u8(jnp, hhi, 1)
                m = (hhi & jnp.where(s > 48, jnp.uint8(255),
                                     jnp.uint8(0))
                     & hlo
                     & jnp.where(v > 80, jnp.uint8(255), jnp.uint8(0)))
            if post:
                m = cvk.erode_u8(jnp, m, 1)
                m = cvk.dilate_u8(jnp, m, 2)
                m = cvk.erode_u8(jnp, m, 1)
            return [m, m, m]

        return fn


@register_element
class Retinex(_CvFilterBase):
    """retinex (gstretinex.cpp): colour enhancement,
    O = gain*(log(I) - log(gaussian(I))) + offset per channel.

    multiscale uses `scales` equally weighted filters, each with the
    reference's sigma_i = 10 + 4*scales (its published quirk: all
    scales share one sigma); basic uses the `sigma` property.  Filter
    size = floor(sigma*6)/2*2+1, gaussian run with sigma "0" exactly
    like the GaussianBlur(size, 0, 0) call it re-specifies."""
    FACTORY = "retinex"
    DESCRIPTION = "Multiscale retinex for colour image enhancement"
    PROPERTIES = {
        "method": (str, "basic", "retinex method: basic or multiscale"),
        "scales": (int, 3, "amount of gaussian filters (scales) used "
                           "in multiscale retinex"),
        "sigma": (float, 14.0, "sigma"),
        "gain": (int, 128, "gain"),
        "offset": (int, 128, "offset"),
    }

    def make_fn(self):
        method = self.props["method"]
        scales = max(1, min(int(self.props["scales"]), 4))
        sigma = float(self.props["sigma"])
        gain = float(self.props["gain"])
        offset = float(self.props["offset"])

        def fsize(s):
            return int(s * 6) // 2 * 2 + 1

        def fn(planes):
            import jax.numpy as jnp
            out = []
            for p in planes[:3]:
                f = p.astype(jnp.float32)
                logi = jnp.log(f)
                if method == "multiscale":
                    acc = logi
                    w = 1.0 / scales
                    s_i = 10.0 + 4.0 * scales
                    for _ in range(scales):
                        blur = cvk.gaussian_blur_f32(jnp, f, fsize(s_i),
                                                     0.0)
                        acc = acc - w * jnp.log(blur)
                    o = acc
                else:
                    blur = cvk.gaussian_blur_f32(jnp, f, fsize(sigma),
                                                 0.0)
                    o = logi - jnp.log(blur)
                out.append(jnp.clip(jnp.floor(o * gain + offset + 0.5),
                                    0, 255).astype(jnp.uint8))
            return out + list(planes[3:])

        return fn


@register_element
class OpencvTextOverlay(_CvFilterBase):
    """opencvtextoverlay (gsttextoverlay.cpp): cv::putText analog.

    Reduction (documented): the Hershey vector font is replaced by the
    PIL rasterizer already used by textoverlay; position is the text
    BASELINE point like putText, scale = (width+height)*0.5 maps to a
    ~22 px/em font, colorR/G/B and thickness (rendered as bold for
    thickness > 1) are honored.  The rasterized text is a trace-time
    constant blended on device."""
    FACTORY = "opencvtextoverlay"
    DESCRIPTION = "Write text on the top of video"
    PROPERTIES = {
        "text": (str, "Opencv Text Overlay", "text to be display"),
        "xpos": (int, 50, "horizontal position"),
        "ypos": (int, 50, "vertical position"),
        "thickness": (int, 2, "font thickness"),
        "colorR": (int, 255, "color red"),
        "colorG": (int, 255, "color green"),
        "colorB": (int, 255, "color blue"),
        "height": (float, 1.0, "letter height"),
        "width": (float, 1.0, "letter width"),
    }

    def _render_mask(self):
        """Rasterize the text once -> (alpha mask, y0, x0)."""
        from PIL import Image, ImageDraw, ImageFont

        scale = (float(self.props["width"])
                 + float(self.props["height"])) * 0.5
        px = max(int(round(22 * scale)), 1)
        try:
            font = ImageFont.truetype(
                "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", px)
        except OSError:
            font = ImageFont.load_default()
        text = self.props["text"]
        img = Image.new("L", (1, 1))
        d = ImageDraw.Draw(img)
        x0, y0, x1, y1 = d.textbbox((0, 0), text, font=font)
        wpx, hpx = max(x1 - x0, 1), max(y1 - y0, 1)
        img = Image.new("L", (wpx, hpx), 0)
        d = ImageDraw.Draw(img)
        stroke = max(int(self.props["thickness"]) - 1, 0) // 2
        d.text((-x0, -y0), text, fill=255, font=font,
               stroke_width=stroke, stroke_fill=255)
        a = np.asarray(img, np.uint8)
        # putText's point is the baseline-left: shift up by ascent
        ascent = int(getattr(font, "getmetrics", lambda: (px, 0))()[0])
        y_top = int(self.props["ypos"]) - ascent
        return a, y_top, int(self.props["xpos"])

    def make_fn(self):
        info = self._info
        a, y0, x0 = self._render_mask()
        h, w = info.height, info.width
        # clip the raster to the frame
        ys, xs = max(y0, 0), max(x0, 0)
        ye, xe = min(y0 + a.shape[0], h), min(x0 + a.shape[1], w)
        if ye <= ys or xe <= xs:
            return None
        sub = a[ys - y0:ye - y0, xs - x0:xe - x0]
        full = np.zeros((h, w), np.uint8)
        full[ys:ye, xs:xe] = sub
        color = (int(self.props["colorR"]), int(self.props["colorG"]),
                 int(self.props["colorB"]))

        def fn(planes):
            import jax.numpy as jnp
            m = jnp.asarray(full) != 0
            return [jnp.where(m, jnp.uint8(c), p)
                    for p, c in zip(planes[:3], color)] \
                + list(planes[3:])

        return fn
