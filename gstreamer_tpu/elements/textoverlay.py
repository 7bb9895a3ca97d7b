"""textoverlay / timeoverlay / clockoverlay / textrender.

Port of gst-plugins-base/ext/pango/: the pango/cairo glyph rasterizer
is replaced by PIL's built-in bitmap font (host-side text -> ARGB
bitmap) while positioning, alignment, shading and the blend itself
follow gstbasetextoverlay.c:
* defaults text="", valignment=baseline, halignment=center,
  xpad=ypad=25, xpos/ypos=0.5 (gstbasetextoverlay.c:46-65);
* timeoverlay renders "%u:%02u:%02u.%03u" of the buffer time
  (gsttimeoverlay.c:142-154), per frame across the batch;
* clockoverlay renders strftime(time-format) of the wall clock
  (gstclockoverlay.c, default "%H:%M:%S");
* textrender converts a text stream to ARGB video frames.

The rendered bitmap is composited on device through the overlay
library's exact BLENDLOOP math (video/overlay.py), so only
rasterization is host work.
"""

from __future__ import annotations

import time as _time
from typing import Optional

import numpy as np

from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)
from ..video.format import pack_planes, unpack_planes
from ..video.info import VideoInfo
from ..video.overlay import (VideoOverlayComposition,
                             VideoOverlayRectangle)
from .videotestsrc import FORMAT_LIST

VIDEO_CAPS = (f"video/x-raw, format={FORMAT_LIST}, width=[1,32767], "
              f"height=[1,32767], framerate=[0/1,2147483647/1]")


def render_text_argb(text: str, font_size: int = 18,
                     shaded: bool = False) -> np.ndarray:
    """Rasterize text to an (h, w, 4) ARGB uint8 bitmap (white glyphs
    on transparent, optional 50% black shading box)."""
    from PIL import Image, ImageDraw, ImageFont

    try:
        font = ImageFont.load_default(size=font_size)
    except TypeError:                      # older Pillow: fixed size
        font = ImageFont.load_default()
    probe = ImageDraw.Draw(Image.new("RGBA", (1, 1)))
    bbox = probe.multiline_textbbox((0, 0), text or " ", font=font)
    w = max(int(bbox[2] - bbox[0]) + 4, 1)
    h = max(int(bbox[3] - bbox[1]) + 4, 1)
    img = Image.new("RGBA", (w, h), (0, 0, 0, 128 if shaded else 0))
    draw = ImageDraw.Draw(img)
    draw.multiline_text((2 - bbox[0], 2 - bbox[1]), text or "",
                        fill=(255, 255, 255, 255), font=font,
                        align="center")
    rgba = np.asarray(img, np.uint8)
    # canonical (A, R, G, B) straight-alpha order for video_blend
    return np.concatenate([rgba[..., 3:4], rgba[..., :3]], axis=-1)


@register_element
class TextOverlay(TransformElement):
    FACTORY = "textoverlay"
    DESCRIPTION = "Adds text strings on top of a video buffer"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("video_sink", PadDirection.SINK, VIDEO_CAPS),
        PadTemplate("src", PadDirection.SRC, VIDEO_CAPS),
    ]
    PROPERTIES = {
        "text": (str, "", "text to render"),
        "valignment": (str, "baseline",
                       "baseline|bottom|top|position|center"),
        "halignment": (str, "center", "left|center|right|position"),
        "xpad": (int, 25, "horizontal padding"),
        "ypad": (int, 25, "vertical padding"),
        "xpos": (float, 0.5, "x position (position mode)"),
        "ypos": (float, 0.5, "y position (position mode)"),
        "shaded-background": (bool, False, "shaded background box"),
        "font-size": (int, 18, "bitmap font size (font-desc analog)"),
        "silent": (bool, False, "don't render"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._cache = {}

    def set_info(self, incaps, outcaps):
        self._info = VideoInfo.from_caps_structure(incaps[0])

    def _bitmap(self, text: str) -> np.ndarray:
        key = (text, self.props["font-size"],
               self.props["shaded-background"])
        if key not in self._cache:
            if len(self._cache) > 64:
                self._cache.clear()
            self._cache[key] = render_text_argb(
                text, self.props["font-size"],
                self.props["shaded-background"])
        return self._cache[key]

    def _place(self, bw: int, bh: int):
        """gst_base_text_overlay_render_text positioning."""
        info = self._info
        xpad, ypad = self.props["xpad"], self.props["ypad"]
        ha, va = self.props["halignment"], self.props["valignment"]
        if ha == "left":
            x = xpad
        elif ha == "right":
            x = info.width - bw - xpad
        elif ha == "position":
            x = int(self.props["xpos"] * (info.width - bw))
        else:
            x = (info.width - bw) // 2
        if va == "top":
            y = ypad
        elif va == "center":
            y = (info.height - bh) // 2
        elif va == "position":
            y = int(self.props["ypos"] * (info.height - bh))
        else:                      # bottom / baseline
            y = info.height - bh - ypad
        return max(x, 0), max(y, 0)

    def _text_for_frame(self, buf: Buffer, k: int) -> str:
        return self.props["text"]

    def _per_frame(self) -> bool:
        return False

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        if self.props["silent"]:
            return buf
        import jax.numpy as jnp

        info = self._info
        fmt = info.finfo

        def blend_one(chans, text):
            if not text:
                return chans
            bmp = self._bitmap(text)
            bh, bw = bmp.shape[:2]
            x, y = self._place(bw, bh)
            comp = VideoOverlayComposition([VideoOverlayRectangle(
                pixels=bmp, render_x=x, render_y=y, render_width=bw,
                render_height=bh)])
            return comp.blend(jnp, chans, fmt.is_rgb, info.width,
                              info.height, bits=fmt.bits)

        chans = unpack_planes(jnp, fmt, buf.data, info.width,
                              info.height)
        if not self._per_frame():
            text = self._text_for_frame(buf, 0)
            if not text:
                return buf
            chans = blend_one(chans, text)
        else:
            batch = int(np.asarray(chans[0]).shape[0])
            outs = []
            for k in range(batch):
                fr = [c[k:k + 1] for c in chans]
                outs.append(blend_one(fr, self._text_for_frame(buf, k)))
            chans = [jnp.concatenate([o[c] for o in outs])
                     for c in range(len(chans))]
        out = pack_planes(jnp, fmt, chans, info.width, info.height)
        return buf.with_(data=out)


@register_element
class TimeOverlay(TextOverlay):
    """timeoverlay (gsttimeoverlay.c): stamps the buffer time."""
    FACTORY = "timeoverlay"
    DESCRIPTION = "Overlays buffer time stamps on a video stream"
    PROPERTIES = dict(TextOverlay.PROPERTIES, **{
        "time-mode": (str, "buffer-time", "buffer-time|stream-time|"
                      "running-time|elapsed-running-time"),
        "valignment": (str, "top", "default top (gsttimeoverlay.c)"),
    })

    def _per_frame(self) -> bool:
        return True

    @staticmethod
    def render_time(ns: Optional[int]) -> str:
        """gst_time_overlay_render_time (gsttimeoverlay.c:142)."""
        if ns is None:
            return " "
        secs_total, ns_rem = divmod(int(ns), 1_000_000_000)
        hours, rem = divmod(secs_total, 3600)
        mins, secs = divmod(rem, 60)
        msecs = ns_rem // 1_000_000
        return f"{hours}:{mins:02d}:{secs:02d}.{msecs:03d}"

    def _text_for_frame(self, buf: Buffer, k: int) -> str:
        pts = buf.pts
        if pts is None:
            return " "
        if buf.duration is not None and buf.batch:
            pts = pts + k * buf.duration // buf.batch
        return self.render_time(pts)


@register_element
class ClockOverlay(TextOverlay):
    """clockoverlay (gstclockoverlay.c): wall-clock stamp."""
    FACTORY = "clockoverlay"
    DESCRIPTION = "Overlays the current clock time on a video stream"
    PROPERTIES = dict(TextOverlay.PROPERTIES, **{
        "time-format": (str, "%H:%M:%S", "strftime format"),
        "valignment": (str, "bottom", "default bottom"),
        "halignment": (str, "left", "default left"),
    })

    def _text_for_frame(self, buf: Buffer, k: int) -> str:
        return _time.strftime(self.props["time-format"],
                              _time.localtime())


@register_element
class TextRender(TransformElement):
    """textrender (gsttextrender.c): text stream -> ARGB frames."""
    FACTORY = "textrender"
    DESCRIPTION = "Renders a text string to an image bitmap"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, "text/x-raw"),
        PadTemplate("src", PadDirection.SRC,
                    "video/x-raw, format=ARGB, width=[1,32767], "
                    "height=[1,32767], framerate=[0/1,2147483647/1]"),
    ]
    PROPERTIES = {
        "valignment": (str, "baseline", ""),
        "halignment": (str, "center", ""),
        "xpad": (int, 25, ""),
        "ypad": (int, 25, ""),
        "font-size": (int, 18, ""),
    }

    def transform_caps(self, direction, caps, filter=None):
        res = (self.src_pads()[0].template_caps
               if direction == PadDirection.SINK
               else Caps.from_string("text/x-raw"))
        if filter is not None:
            res = res.intersect(filter)
        return res

    def fixate_caps(self, direction, caps, othercaps):
        out = othercaps.truncate()[0].copy()
        if direction == PadDirection.SINK:
            if not isinstance(out.get("width"), int):
                out["width"] = 320
            if not isinstance(out.get("height"), int):
                out["height"] = 240
        return Caps([out]).fixate()

    def set_info(self, incaps, outcaps):
        self._info = VideoInfo.from_caps_structure(outcaps[0])

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        texts = buf.data if isinstance(buf.data, list) else [buf.data]
        info = self._info
        frames = []
        for t in texts:
            if isinstance(t, (bytes, bytearray)):
                t = t.decode("utf-8", "replace")
            elif not isinstance(t, str):
                t = np.asarray(t).tobytes().decode("utf-8", "replace")
            bmp = render_text_argb(t, self.props["font-size"])
            bh, bw = bmp.shape[:2]
            canvas = np.zeros((info.height, info.width, 4), np.uint8)
            x = max((info.width - bw) // 2, 0)
            y = max(info.height - bh - self.props["ypad"], 0)
            cw = min(bw, info.width - x)
            ch = min(bh, info.height - y)
            canvas[y:y + ch, x:x + cw] = bmp[:ch, :cw]
            frames.append(canvas)
        arr = np.stack(frames)
        planes = tuple(arr[..., c] for c in range(4))
        # ARGB planes in canonical (R,G,B,A)? pack via pack_planes
        import jax.numpy as jnp
        a, r, g, b = planes
        out = pack_planes(jnp, info.finfo, [jnp.asarray(a),
                                            jnp.asarray(r),
                                            jnp.asarray(g),
                                            jnp.asarray(b)],
                          info.width, info.height)
        return Buffer(data=out, pts=buf.pts, duration=buf.duration,
                      batch=len(frames))
