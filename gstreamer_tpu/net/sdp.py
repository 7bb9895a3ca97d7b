"""SDP library + sdpdemux/sdpsrc + rtpsrc/rtpsink URI bins.

References:
* gst-plugins-base/gst-libs/gst/sdp/gstsdpmessage.c — SDP message
  parse/serialize (v=/o=/s=/c=/t=/m=/a= lines, rtpmap/fmtp
  attributes, per-media connections).
* gst-plugins-bad/gst/sdp/gstsdpdemux.c — builds a receiving chain
  (udpsrc + jitterbuffer + depayloader) per media section; here the
  source-style collapse creates one inner udpsrc per media and emits
  application/x-rtp caps carrying media/encoding-name/clock-rate/pt
  from the rtpmap.
* gst-plugins-bad/gst/rtp/gstrtpsrc.c / gstrtpsink.c — rtp:// URI
  convenience elements over udpsrc/udpsink (+ rtpbin in the
  reference; the batched model pairs them with the jitterbuffer and
  payloaders explicitly).
"""

from __future__ import annotations

from typing import Dict, List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..core.buffer import Buffer, FlowReturn
from ..core.caps import Caps
from ..core.element import (PadDirection, PadPresence, PadTemplate,
                            SinkElement, SourceElement,
                            element_factory_make, register_element)
from ..core.structure import Structure


class SDPMedia:
    def __init__(self, media: str, port: int, proto: str,
                 formats: List[int]):
        self.media = media
        self.port = port
        self.proto = proto
        self.formats = formats
        self.attributes: Dict[str, List[str]] = {}
        self.connection: Optional[str] = None

    def rtpmap(self, pt: int) -> Optional[dict]:
        for v in self.attributes.get("rtpmap", []):
            p, _, enc = v.partition(" ")
            if int(p) != pt:
                continue
            parts = enc.split("/")
            return {"encoding-name": parts[0],
                    "clock-rate": int(parts[1])
                    if len(parts) > 1 else 90000,
                    "encoding-params": parts[2]
                    if len(parts) > 2 else None}
        return None

    def caps(self) -> Caps:
        pt = self.formats[0] if self.formats else 96
        f = {"media": self.media, "payload": pt}
        rm = self.rtpmap(pt)
        if rm:
            f["encoding-name"] = rm["encoding-name"]
            f["clock-rate"] = rm["clock-rate"]
        return Caps([Structure("application/x-rtp", f)])


class SDPMessage:
    """Minimal gst_sdp_message: version/origin/session + medias."""

    def __init__(self):
        self.version = "0"
        self.origin = ""
        self.session_name = ""
        self.connection: Optional[str] = None
        self.attributes: Dict[str, List[str]] = {}
        self.medias: List[SDPMedia] = []

    @classmethod
    def parse(cls, text: str) -> "SDPMessage":
        msg = cls()
        cur: Optional[SDPMedia] = None
        for ln in text.splitlines():
            ln = ln.strip()
            if len(ln) < 2 or ln[1] != "=":
                continue
            key, val = ln[0], ln[2:]
            if key == "v":
                msg.version = val
            elif key == "o":
                msg.origin = val
            elif key == "s":
                msg.session_name = val
            elif key == "c":
                if cur is None:
                    msg.connection = val
                else:
                    cur.connection = val
            elif key == "m":
                parts = val.split()
                cur = SDPMedia(parts[0], int(parts[1]), parts[2],
                               [int(x) for x in parts[3:]])
                msg.medias.append(cur)
            elif key == "a":
                name, _, av = val.partition(":")
                tgt = (cur.attributes if cur is not None
                       else msg.attributes)
                tgt.setdefault(name, []).append(av)
        return msg

    def as_text(self) -> str:
        out = [f"v={self.version}"]
        if self.origin:
            out.append(f"o={self.origin}")
        out.append(f"s={self.session_name or ' '}")
        if self.connection:
            out.append(f"c={self.connection}")
        for name, vals in self.attributes.items():
            for v in vals:
                out.append(f"a={name}:{v}" if v else f"a={name}")
        for m in self.medias:
            fmts = " ".join(str(f) for f in m.formats)
            out.append(f"m={m.media} {m.port} {m.proto} {fmts}")
            if m.connection:
                out.append(f"c={m.connection}")
            for name, vals in m.attributes.items():
                for v in vals:
                    out.append(f"a={name}:{v}" if v
                               else f"a={name}")
        return "\r\n".join(out) + "\r\n"


@register_element
class SdpDemux(SourceElement):
    """sdpdemux (source-style): reads an SDP file, receives the FIRST
    media section's RTP packets via an inner udpsrc and emits them
    with rtpmap-derived caps.  `media` selects audio/video."""
    FACTORY = "sdpdemux"
    DESCRIPTION = "Receive data over the network via SDP"
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC,
                                 "application/x-rtp")]
    PROPERTIES = {
        "location": (str, "", "path to .sdp file"),
        "media": (str, "", "audio|video (first match; '' = first)"),
        "timeout": (float, 0.5, "udp read timeout (s)"),
        "num-buffers": (int, -1, "stop after n reads (-1 = timeout)"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._inner = None
        self._media: Optional[SDPMedia] = None

    def _load(self):
        if self._media is not None:
            return
        msg = SDPMessage.parse(open(self.props["location"]).read())
        want = self.props["media"]
        for m in msg.medias:
            if not want or m.media == want:
                self._media = m
                break
        if self._media is None:
            raise ValueError(f"sdpdemux: no media {want!r} in SDP")

    def get_caps(self, filter=None):
        try:
            self._load()
        except (OSError, ValueError):
            return Caps.from_string("application/x-rtp")
        caps = self._media.caps()
        if filter is not None:
            caps = caps.intersect(filter)
        return caps

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        self._load()
        self._inner = element_factory_make(
            "udpsrc", port=self._media.port,
            timeout=self.props["timeout"])
        self._inner.start()
        self._count = 0

    def stop(self):
        if self._inner is not None:
            self._inner.stop()
            self._inner = None

    def create(self, n_frames: int) -> Optional[Buffer]:
        lim = self.props["num-buffers"]
        if lim >= 0 and self._count >= lim:
            return None
        buf = self._inner.create(n_frames)
        if buf is not None:
            self._count += 1
            buf = buf.with_(meta=dict(buf.meta or {},
                                      caps=self._media.caps()))
        return buf


@register_element
class SdpSrc(SdpDemux):
    """sdpsrc (gstsdpsrc.c): sdp:// URI or inline `sdp` property."""
    FACTORY = "sdpsrc"
    DESCRIPTION = "Stream RTP based on an SDP"
    PROPERTIES = dict(SdpDemux.PROPERTIES,
                      sdp=(str, "", "inline SDP text"))

    def _load(self):
        if self._media is not None:
            return
        if self.props["sdp"]:
            msg = SDPMessage.parse(
                self.props["sdp"].replace("\\n", "\n"))
            want = self.props["media"]
            for m in msg.medias:
                if not want or m.media == want:
                    self._media = m
                    break
            if self._media is None:
                raise ValueError("sdpsrc: no matching media")
            return
        loc = self.props["location"]
        if loc.startswith("sdp://"):
            self.props["location"] = loc[6:]
        super()._load()


@register_element
class RtpSink(SinkElement):
    """rtpsink (gstrtpsink.c): rtp://host:port URI over udpsink."""
    FACTORY = "rtpsink"
    DESCRIPTION = "RTP packet sender"
    PAD_TEMPLATES = [PadTemplate("sink", PadDirection.SINK,
                                 "application/x-rtp")]
    PROPERTIES = {"uri": (str, "rtp://127.0.0.1:5004", "")}

    def start(self):
        u = urlparse(self.props["uri"])
        self._inner = element_factory_make(
            "udpsink", host=u.hostname or "127.0.0.1",
            port=u.port or 5004)
        self._inner.start()

    def stop(self):
        if getattr(self, "_inner", None):
            self._inner.stop()
            self._inner = None

    def render(self, buf: Buffer) -> str:
        return self._inner.render(buf)


@register_element
class RtpSrc(SourceElement):
    """rtpsrc (gstrtpsrc.c): rtp://@:port receiver over udpsrc; caps
    from the `caps` property or URI query (?encoding-name=...)."""
    FACTORY = "rtpsrc"
    DESCRIPTION = "RTP packet receiver"
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC,
                                 "application/x-rtp")]
    PROPERTIES = {
        "uri": (str, "rtp://0.0.0.0:5004", ""),
        "caps": (object, None, "stream caps"),
        "timeout": (float, 0.5, ""),
        "num-buffers": (int, -1, ""),
    }

    def get_caps(self, filter=None):
        caps = self.props["caps"]
        if caps is not None:
            if not isinstance(caps, Caps):
                caps = Caps.from_string(str(caps))
        else:
            u = urlparse(self.props["uri"])
            f = {}
            for k, v in parse_qs(u.query).items():
                f[k] = (int(v[0]) if v[0].isdigit() else v[0])
            caps = Caps([Structure("application/x-rtp", f)])
        if filter is not None:
            caps = caps.intersect(filter)
        return caps

    def set_info(self, incaps, outcaps):
        pass

    def start(self):
        u = urlparse(self.props["uri"])
        self._inner = element_factory_make(
            "udpsrc", host=(u.hostname if u.hostname
                            not in (None, "") else "0.0.0.0"),
            port=u.port or 5004, timeout=self.props["timeout"])
        self._inner.start()
        self._count = 0

    def stop(self):
        if getattr(self, "_inner", None):
            self._inner.stop()
            self._inner = None

    def create(self, n_frames: int) -> Optional[Buffer]:
        lim = self.props["num-buffers"]
        if lim >= 0 and self._count >= lim:
            return None
        buf = self._inner.create(n_frames)
        if buf is not None:
            self._count += 1
        return buf
