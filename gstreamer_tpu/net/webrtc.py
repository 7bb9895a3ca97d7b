"""webrtcbin (reduced) — RTCPeerConnection-style offer/answer over
the SDP library with plain-RTP localhost transport.

References: gst-plugins-bad/gst-libs/gst/webrtc/ (session
description/transceiver/ICE types) and ext/webrtc/gstwebrtcbin.c
(create-offer / create-answer / set-local-description /
set-remote-description signalling state machine, transceivers with
direction, on-negotiation-needed).

Scope: the JSEP state machine, SDP generation/parsing, transceiver
plumbing, host ICE candidates on 127.0.0.1, and DTLS-SRTP transport
security (RFC 5764): offers carry a=fingerprint/a=setup, the DTLS
handshake runs over the media ports (net/dtls.py, OpenSSL-backed like
the reference ext/dtls) and media is SRTP-protected with the exported
keys (clean-room RFC 3711 cipher, net/srtp.py).  The certificate the
peer presents is verified against the SDP a=fingerprint (RFC 8122 /
5763 §5); a mismatch fails the connection.  While enable-dtls=true
(the default) the bin NEVER sends plain RTP — if libssl is absent or
the peer offers no fingerprint the connection fails; plain-RTP
transport requires an explicit enable-dtls=false on both sides.
Signalling is the application's job, exactly as with the reference
element."""

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
        "stun-server": (str, "", "ignored (host candidates only)"),
        "latency": (int, 200, ""),
        "enable-dtls": (bool, True, "DTLS-SRTP transport (RFC 5764)"),
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
        self._agent = None
        self._dtls = None
        self._srtp_send = None
        self._srtp_recv = None
        self._hs_thread = None

    # -- DTLS-SRTP ---------------------------------------------------------
    def _dtls_enabled(self) -> bool:
        from .dtls import available
        return self.props.get("enable-dtls", True) and available()

    def _ensure_agent(self):
        if self._agent is None and self._dtls_enabled():
            from .dtls import DtlsAgent
            self._agent = DtlsAgent()
        return self._agent

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
        agent = self._ensure_agent()
        m = SDPMedia(media=t.kind, port=t.local_port,
                     proto=("UDP/TLS/RTP/SAVPF" if agent
                            else "RTP/AVP"),
                     formats=[str(t.pt)])
        m.connection = "IN IP4 127.0.0.1"
        m.attributes.append(
            ("rtpmap", f"{t.pt} {t.encoding_name}/{t.clock_rate}"))
        m.attributes.append((t.direction, ""))
        if agent is not None:
            m.attributes.append(("fingerprint", agent.fingerprint()))
            # offerer is actpass; answerer takes the active role and
            # becomes the DTLS client (RFC 5763 §5)
            role = ("actpass" if self.remote_description is None
                    else "active")
            m.attributes.append(("setup", role))
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
            t.remote_port = rm.port
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
        agent = self._ensure_agent()
        remote_dtls = False
        if self.remote_description is not None:
            for rm in self.remote_description.sdp.medias:
                if rm.get_attribute_val("fingerprint"):
                    remote_dtls = True
        if self.props.get("enable-dtls", True) and (
                agent is None or not remote_dtls):
            # Never degrade to unencrypted media while DTLS is
            # requested (the default): the reference webrtcbin refuses
            # to send plain RTP.  Plain-RTP transport requires an
            # explicit enable-dtls=false on BOTH sides.
            self.connection_state = "failed"
            return
        if agent is not None and remote_dtls:
            self.connection_state = "connecting"
            # answerer (a=setup:active) is the DTLS client
            is_client = (self.local_description is not None
                         and self.local_description.type == "answer")
            self._dtls = agent.connection(is_client)
            import threading
            self._hs_thread = threading.Thread(
                target=self._dtls_handshake_loop, daemon=True)
            self._hs_thread.start()
        else:
            self.connection_state = "connected"

    def _dtls_handshake_loop(self):
        """Pump the DTLS handshake over the media ports (RFC 5764
        demultiplexes by first byte: DTLS 20..63, RTP 128..191)."""
        import time as _time
        t = self.transceivers[0]
        dest = ("127.0.0.1", t.remote_port)
        try:
            self._dtls.pump()
            deadline = _time.time() + 10.0
            last_flight = b""
            while not self._dtls.complete and _time.time() < deadline:
                out = self._dtls.take_outgoing()
                if out:
                    last_flight = out
                    self._send_sock.sendto(out, dest)
                try:
                    data, _ = self._recv_sock.recvfrom(65536)
                except (socket.timeout, OSError):
                    # memory-BIO DTLS has no timer-driven
                    # retransmission: re-pump and re-send the last
                    # flight so a lost datagram (or a peer whose
                    # receive thread started late) can't stall the
                    # handshake until the deadline
                    self._dtls.pump()
                    more = self._dtls.take_outgoing()
                    if more:
                        last_flight = more
                        self._send_sock.sendto(more, dest)
                    elif last_flight:
                        self._send_sock.sendto(last_flight, dest)
                    continue
                if data and 20 <= data[0] <= 63:
                    self._dtls.feed_incoming(data)
            out = self._dtls.take_outgoing()
            if out:
                self._send_sock.sendto(out, dest)
            if self._dtls.complete:
                if not self._verify_peer_fingerprint():
                    self.connection_state = "failed"
                    return
                from .srtp import SrtpSession
                (sk, ss), (rk, rs) = self._dtls.srtp_send_recv_keys()
                self._srtp_send = SrtpSession(sk, ss)
                self._srtp_recv = SrtpSession(rk, rs)
                self.connection_state = "connected"
            else:
                self.connection_state = "failed"
        except Exception:
            self.connection_state = "failed"

    def _verify_peer_fingerprint(self) -> bool:
        """RFC 8122 / RFC 5763 §5: the certificate presented in the
        DTLS handshake MUST match the a=fingerprint signalled in the
        remote SDP; an on-path attacker presenting its own cert is
        rejected here (the reference verifies the digest in its dtls
        plugin, gstdtlsconnection.c)."""
        presented = self._dtls.peer_fingerprint()
        if presented is None or self.remote_description is None:
            return False
        def norm(fp: str) -> str:
            return " ".join(fp.strip().split()).upper()
        for rm in self.remote_description.sdp.medias:
            sig = rm.get_attribute_val("fingerprint")
            if sig and norm(sig) == norm(presented):
                return True
        return False

    def render(self, buf: Buffer) -> str:
        if self.connection_state != "connected":
            return FlowReturn.OK
        t = self.transceivers[0]
        d = buf.data
        for b in (d if isinstance(d, (list, tuple)) else [d]):
            raw = (bytes(b) if isinstance(b, (bytes, bytearray))
                   else np.asarray(b).tobytes())
            if self._srtp_send is not None:
                raw = self._srtp_send.protect(raw)
            self._send_sock.sendto(raw,
                                   ("127.0.0.1", t.remote_port))
        return FlowReturn.OK

    def pull_received(self, max_packets: int = 64) -> List[bytes]:
        out = []
        if self._recv_sock is None \
                or self.connection_state == "connecting":
            return out
        for _ in range(max_packets):
            try:
                data, _ = self._recv_sock.recvfrom(65536)
            except socket.timeout:
                break
            if data and 20 <= data[0] <= 63:
                continue                      # stray DTLS retransmit
            if self._srtp_recv is not None:
                data = self._srtp_recv.unprotect(data)
                if data is None:
                    continue                  # auth failure: drop
            out.append(data)
        return out

    def stop(self):
        for s in (self._send_sock, self._recv_sock):
            if s is not None:
                s.close()
        self._send_sock = self._recv_sock = None
