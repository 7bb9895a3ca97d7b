"""overlaycomposition — application-drawn overlays blended onto video.

Reference: subprojects/gst-plugins-base/gst/overlaycomposition/
gstoverlaycomposition.c — emits a "draw" signal per frame; the
application returns a GstVideoOverlayComposition which the element
blends onto the frame (via gst_video_overlay_composition_blend /
video-blend.c) when downstream does not handle the meta itself.

Here `draw` is a Python callable (buf -> VideoOverlayComposition|None);
a static `composition` attribute and a per-buffer
buf.meta["overlay-composition"] (the GstVideoOverlayCompositionMeta
equivalent) are also honoured, in that priority order:
meta > draw > static composition.
"""

from __future__ import annotations

from typing import Callable, Optional

from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)
from ..video.format import pack_planes, unpack_planes
from ..video.info import VideoInfo
from ..video.overlay import VideoOverlayComposition
from .videotestsrc import FORMAT_LIST

VIDEO_CAPS = (f"video/x-raw, format={FORMAT_LIST}, width=[1,32767], "
              f"height=[1,32767], framerate=[0/1,2147483647/1]")


@register_element
class OverlayCompositionElement(TransformElement):
    FACTORY = "overlaycomposition"
    KLASS = "Filter/Editor/Video"
    DESCRIPTION = "Overlay an image onto a video stream"
    HOST_ELEMENT = True   # draw callback runs per buffer on the host
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, VIDEO_CAPS),
        PadTemplate("src", PadDirection.SRC, VIDEO_CAPS),
    ]

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self.draw: Optional[Callable[[Buffer],
                                     Optional[VideoOverlayComposition]]] = None
        self.composition: Optional[VideoOverlayComposition] = None
        self._info: Optional[VideoInfo] = None

    def set_info(self, incaps: Optional[Caps], outcaps: Optional[Caps]):
        if incaps is not None:
            self._info = VideoInfo.from_caps_structure(incaps[0])

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        comp = buf.meta.get("overlay-composition")
        if comp is None and self.draw is not None:
            comp = self.draw(buf)
        if comp is None:
            comp = self.composition
        if comp is None or comp.n_rectangles == 0:
            return buf
        import jax.numpy as jnp

        info = self._info
        fmt = info.finfo
        chans = unpack_planes(jnp, fmt, buf.data, info.width, info.height)
        chans = comp.blend(jnp, chans, fmt.is_rgb, info.width, info.height,
                           bits=fmt.bits)
        out = pack_planes(jnp, fmt, chans, info.width, info.height)
        return buf.with_(data=out)
