"""webrtcbin (reduced) — RTCPeerConnection-style offer/answer over
the SDP library with plain-RTP localhost transport.

References: gst-plugins-bad/gst-libs/gst/webrtc/ (session
description/transceiver/ICE types) and ext/webrtc/gstwebrtcbin.c
(create-offer / create-answer / set-local-description /
set-remote-description signalling state machine, transceivers with
direction, on-negotiation-needed).

Reduced scope (documented): no DTLS/SRTP encryption and no STUN/TURN
— candidates are host candidates on 127.0.0.1 and media flows as
plain RTP over the negotiated UDP ports (the JSEP state machine,
SDP generation/parsing and transceiver plumbing are real; transport
security is not implemented).  Signalling is the application's job,
exactly as with the reference element."""

from __future__ import annotations

import socket
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..core.buffer import Buffer, FlowReturn
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, SinkElement,
                            element_factory_make, register_element)
from .sdp import SDPMedia, SDPMessage


@dataclass
class WebRTCSessionDescription:
    type: str                            # "offer" | "answer"
    sdp: SDPMessage

    def as_text(self) -> str:
        return self.sdp.as_text()


@dataclass
class WebRTCRTPTransceiver:
    kind: str                            # "audio" | "video"
    direction: str = "sendrecv"
    pt: int = 96
    encoding_name: str = ""
    clock_rate: int = 90000
    mline: int = -1
    local_port: int = 0
    remote_port: int = 0


def _free_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@register_element
class WebRTCBin(SinkElement):
    """webrtcbin: JSEP endpoint.  Feed application/x-rtp on the sink
    pad (sent over the negotiated transport); received packets are
    available via `pull_received()` / the receive queue — the batch
    model's analog of the dynamic src pads."""
    FACTORY = "webrtcbin"
    DESCRIPTION = "A bin for webrtc connections"
    PAD_TEMPLATES = [PadTemplate("sink", PadDirection.SINK,
                                 "application/x-rtp")]
    PROPERTIES = {
        "stun-server": (str, "", "ignored (no STUN in reduced mode)"),
        "latency": (int, 200, ""),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self.transceivers: List[WebRTCRTPTransceiver] = []
        self.local_description: Optional[
            WebRTCSessionDescription] = None
        self.remote_description: Optional[
            WebRTCSessionDescription] = None
        self.signaling_state = "stable"
        self.connection_state = "new"
        self.on_negotiation_needed = None
        self._send_sock: Optional[socket.socket] = None
        self._recv_sock: Optional[socket.socket] = None

    # -- transceivers ------------------------------------------------------
    def add_transceiver(self, direction: str, kind: str,
                        pt: int = 96, encoding_name: str = "",
                        clock_rate: int = 90000
                        ) -> WebRTCRTPTransceiver:
        t = WebRTCRTPTransceiver(
            kind=kind, direction=direction, pt=pt,
            encoding_name=encoding_name or
            ("H264" if kind == "video" else "PCMU"),
            clock_rate=clock_rate, mline=len(self.transceivers))
        self.transceivers.append(t)
        if self.on_negotiation_needed:
            self.on_negotiation_needed(self)
        return t

    # -- JSEP --------------------------------------------------------------
    def _media_for(self, t: WebRTCRTPTransceiver) -> SDPMedia:
        if not t.local_port:
            t.local_port = _free_port()
        m = SDPMedia(media=t.kind, port=t.local_port,
                     proto="RTP/AVP", formats=[str(t.pt)])
        m.connection = "IN IP4 127.0.0.1"
        m.attributes.append(
            ("rtpmap", f"{t.pt} {t.encoding_name}/{t.clock_rate}"))
        m.attributes.append((t.direction, ""))
        m.attributes.append(
            ("candidate",
             f"1 1 UDP 2113937151 127.0.0.1 {t.local_port} "
             f"typ host"))
        return m

    def create_offer(self) -> WebRTCSessionDescription:
        msg = SDPMessage()
        msg.origin = "- 0 0 IN IP4 127.0.0.1"
        msg.session_name = "-"
        msg.connection = "IN IP4 127.0.0.1"
        for t in self.transceivers:
            msg.medias.append(self._media_for(t))
        return WebRTCSessionDescription("offer", msg)

    def create_answer(self) -> WebRTCSessionDescription:
        if self.remote_description is None \
                or self.remote_description.type != "offer":
            raise ValueError(
                "webrtcbin: create_answer without a remote offer")
        msg = SDPMessage()
        msg.origin = "- 0 0 IN IP4 127.0.0.1"
        msg.session_name = "-"
        msg.connection = "IN IP4 127.0.0.1"
        for i, rm in enumerate(self.remote_description.sdp.medias):
            if i < len(self.transceivers):
                t = self.transceivers[i]
            else:
                maps = rm.rtpmaps()
                pt = int(rm.formats[0]) if rm.formats else 96
                enc, rate, _ = maps.get(pt, ("", 90000, 1))
                t = WebRTCRTPTransceiver(
                    kind=rm.media, direction="sendrecv", pt=pt,
                    encoding_name=enc, clock_rate=rate,
                    mline=len(self.transceivers))
                self.transceivers.append(t)
            msg.medias.append(self._media_for(t))
        return WebRTCSessionDescription("answer", msg)

    def set_local_description(
            self, desc: WebRTCSessionDescription) -> None:
        self.local_description = desc
        if desc.type == "offer":
            self.signaling_state = "have-local-offer"
        else:
            self.signaling_state = "stable"
            self._connect()

    def set_remote_description(
            self, desc: WebRTCSessionDescription) -> None:
        self.remote_description = desc
        for i, rm in enumerate(desc.sdp.medias):
            if i < len(self.transceivers):
                self.transceivers[i].remote_port = rm.port
        if desc.type == "offer":
            self.signaling_state = "have-remote-offer"
        else:
            self.signaling_state = "stable"
            self._connect()

    # -- transport (reduced: plain RTP over the candidate ports) -----------
    def _connect(self) -> None:
        if not self.transceivers:
            return
        t = self.transceivers[0]
        if self._recv_sock is None and t.local_port:
            self._recv_sock = socket.socket(socket.AF_INET,
                                            socket.SOCK_DGRAM)
            self._recv_sock.setsockopt(socket.SOL_SOCKET,
                                       socket.SO_REUSEADDR, 1)
            try:
                self._recv_sock.bind(("127.0.0.1", t.local_port))
            except OSError:
                pass
            self._recv_sock.settimeout(0.5)
        if self._send_sock is None:
            self._send_sock = socket.socket(socket.AF_INET,
                                            socket.SOCK_DGRAM)
        self.connection_state = "connected"

    def render(self, buf: Buffer) -> str:
        if self.connection_state != "connected":
            return FlowReturn.OK
        t = self.transceivers[0]
        d = buf.data
        for b in (d if isinstance(d, (list, tuple)) else [d]):
            raw = (bytes(b) if isinstance(b, (bytes, bytearray))
                   else np.asarray(b).tobytes())
            self._send_sock.sendto(raw,
                                   ("127.0.0.1", t.remote_port))
        return FlowReturn.OK

    def pull_received(self, max_packets: int = 64) -> List[bytes]:
        out = []
        if self._recv_sock is None:
            return out
        for _ in range(max_packets):
            try:
                data, _ = self._recv_sock.recvfrom(65536)
                out.append(data)
            except socket.timeout:
                break
        return out

    def stop(self):
        for s in (self._send_sock, self._recv_sock):
            if s is not None:
                s.close()
        self._send_sock = self._recv_sock = None
