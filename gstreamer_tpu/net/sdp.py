"""SDP (Session Description Protocol, RFC 4566) parsing/serialization.

TPU-native slice of the reference SDP library
(gst-plugins-base/gst-libs/gst/sdp/gstsdpmessage.c): parse/produce
session descriptions, including the rtpmap attribute handling used to
pair SDP with the RTP elements (net/rtp.py) for stream setup.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class SDPMedia:
    media: str = ""                 # audio | video | ...
    port: int = 0
    proto: str = "RTP/AVP"
    formats: List[str] = field(default_factory=list)
    attributes: List[Tuple[str, str]] = field(default_factory=list)
    connection: str = ""

    def get_attribute_val(self, key: str) -> Optional[str]:
        for k, v in self.attributes:
            if k == key:
                return v
        return None

    def rtpmaps(self) -> Dict[int, Tuple[str, int, int]]:
        """pt -> (encoding, clock-rate, channels) from a=rtpmap."""
        out = {}
        for k, v in self.attributes:
            if k != "rtpmap":
                continue
            pt, enc = v.split(" ", 1)
            parts = enc.split("/")
            name = parts[0]
            rate = int(parts[1]) if len(parts) > 1 else 0
            ch = int(parts[2]) if len(parts) > 2 else 1
            out[int(pt)] = (name, rate, ch)
        return out


@dataclass
class SDPMessage:
    version: str = "0"
    origin: str = ""
    session_name: str = ""
    connection: str = ""
    times: List[str] = field(default_factory=list)
    attributes: List[Tuple[str, str]] = field(default_factory=list)
    medias: List[SDPMedia] = field(default_factory=list)

    @classmethod
    def parse(cls, text: str) -> "SDPMessage":
        """gst_sdp_message_parse_buffer."""
        msg = cls()
        cur: Optional[SDPMedia] = None
        for line in text.splitlines():
            line = line.strip()
            if len(line) < 2 or line[1] != "=":
                continue
            key, val = line[0], line[2:]
            if key == "v":
                msg.version = val
            elif key == "o":
                msg.origin = val
            elif key == "s":
                msg.session_name = val
            elif key == "c":
                if cur is not None:
                    cur.connection = val
                else:
                    msg.connection = val
            elif key == "t":
                msg.times.append(val)
            elif key == "m":
                parts = val.split()
                cur = SDPMedia(media=parts[0], port=int(parts[1]),
                               proto=parts[2], formats=parts[3:])
                msg.medias.append(cur)
            elif key == "a":
                k, _, v = val.partition(":")
                target = cur.attributes if cur is not None \
                    else msg.attributes
                target.append((k, v))
        return msg

    def as_text(self) -> str:
        """gst_sdp_message_as_text."""
        lines = [f"v={self.version}"]
        if self.origin:
            lines.append(f"o={self.origin}")
        lines.append(f"s={self.session_name or ' '}")
        if self.connection:
            lines.append(f"c={self.connection}")
        for t in (self.times or ["0 0"]):
            lines.append(f"t={t}")
        for k, v in self.attributes:
            lines.append(f"a={k}:{v}" if v else f"a={k}")
        for m in self.medias:
            lines.append(f"m={m.media} {m.port} {m.proto} "
                         + " ".join(m.formats))
            if m.connection:
                lines.append(f"c={m.connection}")
            for k, v in m.attributes:
                lines.append(f"a={k}:{v}" if v else f"a={k}")
        return "\r\n".join(lines) + "\r\n"


def media_to_caps(media: SDPMedia, pt: int):
    """gst_sdp_media_get_caps_from_media: build application/x-rtp caps
    with the rtpmap fields."""
    from ..core.caps import Caps

    maps = media.rtpmaps()
    enc, rate, ch = maps.get(pt, ("", 0, 1))
    s = (f"application/x-rtp, media=(string){media.media}, "
         f"payload=(int){pt}")
    if enc:
        s += f", encoding-name=(string){enc}"
    if rate:
        s += f", clock-rate=(int){rate}"
    if ch > 1:
        s += f", channels=(int){ch}"
    return Caps.from_string(s)
