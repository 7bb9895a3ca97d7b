"""Playback autoplugging: typefind element, decodebin, uridecodebin,
playbin equivalents.

Reference: subprojects/gst-plugins-base/gst/playback/ — gstdecodebin3.c
(caps-driven graph auto-construction from rank-sorted factories),
gstplaybin3.c, gsturidecodebin3.c; gstreamer/plugins/elements/
gsttypefindelement.c.

The batched runtime autopluggs at negotiation time: uridecodebin sniffs
the URI (utils/typefind.py), instantiates the matching parser source
internally, and proxies its caps/data.
"""

from __future__ import annotations

from typing import Optional

from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (Element, PadDirection, PadTemplate,
                            SinkElement, SourceElement, TransformElement,
                            element_factory_make, register_element)
from ..utils.typefind import DECODABLE, decodable_for, type_find_file


def _decoder_for_caps(caps) -> Optional[str]:
    """Coded-stream caps from a demuxer -> decoder factory to append
    (the rank-sorted factory pick of gstdecodebin3.c, reduced to the
    registered decoder table)."""
    if caps is None or caps.is_any or not len(caps):
        return None
    from ..core.element import factory_exists
    s = caps[0]
    name = s.name
    cand = None
    if name == "video/x-h264":
        cand = "avdec_h264"
    elif name == "video/x-h265":
        cand = "avdec_h265"
    elif name == "video/x-av1":
        cand = "avdec_av1"
    elif name == "image/jpeg":
        cand = "jpegdec"
    elif name == "video/mpeg" and not s.get("systemstream"):
        cand = ("avdec_mpeg2video" if s.get("mpegversion") == 2
                else "avdec_mpeg4")
    elif name == "audio/x-ac3":
        cand = "a52dec"
    elif name == "audio/x-dts":
        cand = "dtsdec"
    elif name == "audio/mpeg":
        ver = s.get("mpegversion")
        cand = ("mpg123audiodec" if ver in (1, None) else "faad")
    if cand is not None and not factory_exists(cand):
        return None
    return cand


class _ChainSrc(SourceElement):
    """Internal source wrapping a decode chain launch description:
    the chain runs once into an appsink; samples are then replayed as
    this element's output (how decodebin3 exposes parsebin output,
    collapsed to the offline batch model)."""
    FACTORY = ""
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC, Caps.any())]
    PROPERTIES = {"description": (str, "", "launch chain")}

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._samples = None
        self._caps = None
        self._pos = 0

    def _load(self):
        if self._samples is not None:
            return
        from ..core.parse import parse_launch
        pipe = parse_launch(self.props["description"]
                            + " ! appsink name=__chain_sink")
        pipe.run()
        sink = pipe.get_by_name("__chain_sink")
        self._samples = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            self._caps = s.caps
            self._samples.append(s.buffer)

    def get_caps(self, filter=None):
        try:
            self._load()
        except (OSError, ValueError):
            return Caps.any()
        caps = self._caps if self._caps is not None else Caps.any()
        if filter is not None and not caps.is_any:
            caps = caps.intersect(filter)
        return caps

    def start(self):
        self._load()
        self._pos = 0

    def create(self, n_frames):
        if not self._samples or self._pos >= len(self._samples):
            return None
        buf = self._samples[self._pos]
        self._pos += 1
        return buf


@register_element
class TypeFindElement(TransformElement):
    """typefind element: sniffs the stream, exposes .caps (the sniffed
    media type) and fires have-type callbacks."""
    FACTORY = "typefind"
    DESCRIPTION = "Finds the media type of a stream"
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, Caps.any()),
        PadTemplate("src", PadDirection.SRC, Caps.any()),
    ]

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self.caps_found: Optional[str] = None
        self.have_type_cb = None

    def process_meta(self, buf: Buffer) -> Buffer:
        if self.caps_found is None:
            import numpy as np
            from ..utils.typefind import type_find_data
            data = np.asarray(buf.data).tobytes()[:64]
            self.caps_found, prob = type_find_data(data)
            if self.have_type_cb:
                self.have_type_cb(self.caps_found, prob)
        return buf


@register_element
class UriDecodeBin(SourceElement):
    """uridecodebin: uri -> raw stream via autoplugging."""
    FACTORY = "uridecodebin"
    DESCRIPTION = "Autoplug a URI to raw media"
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC, Caps.any())]
    PROPERTIES = {"uri": (str, "", "file:// URI or path")}

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._inner: Optional[SourceElement] = None

    def _ensure_inner(self):
        if self._inner is not None:
            return
        uri = self.props["uri"]
        path = uri[7:] if uri.startswith("file://") else uri
        mtype, _prob = type_find_file(path)
        factory = decodable_for(mtype)
        if factory is None:
            raise ValueError(
                f"uridecodebin: no decoder for {mtype!r} ({path!r})")
        if "!" in factory:
            self._inner = _ChainSrc(
                description=factory.format(path=path))
            return
        inner = element_factory_make(factory, location=path)
        dec = _decoder_for_caps(inner.get_caps())
        if dec is not None:
            self._inner = _ChainSrc(
                description=f"{factory} location={path} ! {dec}")
        else:
            self._inner = inner

    def get_caps(self, filter=None):
        self._ensure_inner()
        return self._inner.get_caps(filter)

    def fixate(self, caps):
        self._ensure_inner()
        return self._inner.fixate(caps)

    def set_info(self, incaps, outcaps):
        self._inner.set_info(incaps, outcaps)

    def start(self):
        self._ensure_inner()
        self._inner.start()

    def stop(self):
        if self._inner:
            self._inner.stop()

    def do_seek(self, segment):
        return (self._inner.do_seek(segment)
                if hasattr(self._inner, "do_seek") else False)

    def create(self, n_frames):
        return self._inner.create(n_frames)


@register_element
class DecodeBin(UriDecodeBin):
    """decodebin3-style alias (uri-driven in the batched model)."""
    FACTORY = "decodebin"
    DESCRIPTION = "Autoplug a stream to raw media"


@register_element
class PlayBin(SinkElement):
    """playbin3 equivalent for the offline runtime: builds
    uridecodebin ! (convert) ! appsink internally and exposes frames via
    pull_sample / a sample callback."""
    FACTORY = "playbin"
    DESCRIPTION = "Autoplug and render a URI (offline: collect samples)"
    PAD_TEMPLATES = []
    PROPERTIES = {
        "uri": (str, "", ""),
        "video-format": (str, "RGB", "output video format"),
    }

    def build_pipeline(self):
        from ..core.parse import parse_launch
        uri = self.props["uri"]
        path = uri[7:] if uri.startswith("file://") else uri
        mtype, _ = type_find_file(path)
        factory = decodable_for(mtype)
        if factory is None:
            raise ValueError(f"playbin: cannot play {mtype!r}")
        if mtype == "application/x-yuv4mpeg":
            desc = (f"filesrc location={path} ! videoconvert ! "
                    f"video/x-raw,format={self.props['video-format']} ! "
                    f"appsink name=playsink")
        elif "!" in factory:
            desc = (factory.format(path=path)
                    + " ! audioconvert ! appsink name=playsink")
        else:
            el = element_factory_make(factory, location=path)
            caps = el.get_caps()
            dec = _decoder_for_caps(caps)
            head = f"{factory} location={path}"
            if dec is not None:
                head += f" ! {dec}"
            is_audio = (caps is not None and not caps.is_any
                        and caps[0].name.startswith("audio"))
            if is_audio:
                desc = (f"{head} ! audioconvert ! "
                        f"appsink name=playsink")
            else:
                desc = (f"{head} ! videoconvert ! "
                        f"video/x-raw,format="
                        f"{self.props['video-format']} ! "
                        f"appsink name=playsink")
        pipe = parse_launch(desc)
        return pipe, pipe.get_by_name("playsink")
