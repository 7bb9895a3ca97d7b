"""faceoverlay — overlay an image on detected faces.

Reference: gst-plugins-bad/gst/faceoverlay/gstfaceoverlay.c — a bin of
``facedetect ! rsvgoverlay`` where each detected face positions the
overlay: ``svg_x = face.x + x * face.width`` and
``svg_width = w * face.width`` (gstfaceoverlay.c:243-246), with x/y/w/h
as face-relative fractions.

Documented reduction (same as rsvgoverlay, elements/pixbuf_overlay.py):
``location`` takes a pre-rasterized image (PNG/JPEG/BMP/GIF via the
native codecs), not an SVG — there is no SVG renderer in this
environment.  Detection is the same clean-room Haar cascade the
facedetect element uses (ops/haar.py path via opencv_camera)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.element import PadDirection, PadTemplate, register_element
from ..video.overlay import (VideoOverlayComposition,
                             VideoOverlayRectangle)
from ..ops import cv_kernels as cvk
from .opencv_camera import RGB_CAPS, _CascadeBase
from .pixbuf_overlay import _OverlayBase, decode_image


@register_element
class FaceOverlay(_OverlayBase):
    FACTORY = "faceoverlay"
    DESCRIPTION = "Overlays an image on detected faces in a video " \
                  "stream"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, RGB_CAPS),
        PadTemplate("src", PadDirection.SRC, RGB_CAPS),
    ]
    PROPERTIES = {
        "location": (str, "", "overlay image file (pre-rasterized; "
                              "reference takes an SVG)"),
        "profile": (str, "", "face cascade XML path"),
        "x": (float, 0.0, "x offset, fraction of face width"),
        "y": (float, 0.0, "y offset, fraction of face height"),
        "w": (float, 1.0, "overlay width, fraction of face width"),
        "h": (float, 1.0, "overlay height, fraction of face height"),
        "scale-factor": (float, 1.25, "detector scale factor"),
        "min-neighbors": (int, 3, "minimum neighbor votes"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._rgba = None
        self._cascade = None

    def start(self):
        self._rgba = None
        loc = self.props["location"]
        if loc:
            with open(loc, "rb") as f:
                self._rgba = decode_image(f.read())
        self._cascade = _CascadeBase._load(self, self.props["profile"])

    def _composition(self, buf, k
                     ) -> Optional[VideoOverlayComposition]:
        if self._rgba is None or self._cascade is None:
            return None
        planes = [np.asarray(p) for p in buf.data]
        gray = cvk.rgb2gray_u8(np, planes[0][k], planes[1][k],
                               planes[2][k])
        faces = self._cascade.detect_multi_scale(
            gray, float(self.props["scale-factor"]),
            int(self.props["min-neighbors"]))
        if not faces:
            return None
        argb = np.concatenate([self._rgba[..., 3:4],
                               self._rgba[..., :3]], -1)
        rects = []
        for (fx, fy, fw, fh) in faces:
            # gstfaceoverlay.c:243-246 face-relative placement
            rects.append(VideoOverlayRectangle(
                argb,
                render_x=int(fx + self.props["x"] * fw),
                render_y=int(fy + self.props["y"] * fh),
                render_width=max(1, int(self.props["w"] * fw)),
                render_height=max(1, int(self.props["h"] * fh))))
        return VideoOverlayComposition(rects)
