"""ICE/STUN tests (RFC 5389 / RFC 8445 reduced).

Reference behavior:
gst-plugins-bad/gst-libs/gst/webrtc/nice/gstwebrtcnice.c:1 (agent,
candidates, trickle), ext/webrtc/gstwebrtcbin.c:1 (signals).
"""

import multiprocessing as mp
import os
import socket
import struct
import time

import pytest

from gstreamer_tpu.net import dtls as D
from gstreamer_tpu.net.ice import (ATTR_PRIORITY, ATTR_USERNAME,
                                   ATTR_XOR_MAPPED_ADDRESS,
                                   BINDING_REQUEST, BINDING_SUCCESS,
                                   IceAgent, IceCandidate, StunServer,
                                   build_stun, is_stun, parse_stun,
                                   xor_address_attr)

needs_ssl = pytest.mark.skipif(not D.available(),
                               reason="libssl not available")


class TestStunCodec:
    def test_roundtrip_binding_request(self):
        txid = os.urandom(12)
        raw = build_stun(BINDING_REQUEST, txid,
                         [(ATTR_PRIORITY, struct.pack(">I", 1234))])
        assert is_stun(raw)
        msg = parse_stun(raw)
        assert msg.msg_type == BINDING_REQUEST
        assert msg.txid == txid
        assert struct.unpack(">I", msg.attrs[ATTR_PRIORITY])[0] == 1234

    def test_xor_mapped_address(self):
        raw = build_stun(BINDING_SUCCESS, os.urandom(12),
                         [xor_address_attr("192.168.1.7", 50000)])
        msg = parse_stun(raw)
        assert msg.xor_mapped() == ("192.168.1.7", 50000)

    def test_message_integrity_verifies_and_rejects(self):
        key = b"swordfish"
        raw = build_stun(BINDING_REQUEST, os.urandom(12),
                         [(ATTR_USERNAME, b"a:b")],
                         integrity_key=key)
        msg = parse_stun(raw)
        assert msg.check_integrity(key)
        assert not msg.check_integrity(b"wrong")
        tampered = bytearray(raw)
        tampered[25] ^= 0xFF
        msg2 = parse_stun(bytes(tampered))
        assert msg2 is None or not msg2.check_integrity(key)

    def test_fingerprint_appended(self):
        raw = build_stun(BINDING_REQUEST, os.urandom(12), [])
        # last attr is FINGERPRINT (0x8028), 4 bytes
        t, ln = struct.unpack(">HH", raw[-8:-4])
        assert t == 0x8028 and ln == 4

    def test_is_stun_rejects_rtp_and_dtls(self):
        rtp = struct.pack("!BBHII", 0x80, 96, 1, 0, 7) + b"x" * 8
        assert not is_stun(rtp)
        dtls = bytes([22, 254, 253]) + b"\0" * 16
        assert not is_stun(dtls)

    def test_candidate_sdp_roundtrip(self):
        c = IceCandidate("1", 1, 2130706431, "10.0.0.2", 9999,
                         "srflx", raddr="192.168.0.2", rport=1111)
        c2 = IceCandidate.from_sdp("candidate:" + c.to_sdp())
        assert (c2.address, c2.port, c2.typ, c2.raddr, c2.rport) == \
            ("10.0.0.2", 9999, "srflx", "192.168.0.2", 1111)


class TestStunServer:
    def test_binding_roundtrip(self):
        srv = StunServer()
        try:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.bind(("127.0.0.1", 0))
            s.settimeout(2.0)
            txid = os.urandom(12)
            s.sendto(build_stun(BINDING_REQUEST, txid, []), srv.addr)
            data, _ = s.recvfrom(2048)
            msg = parse_stun(data)
            assert msg.msg_type == BINDING_SUCCESS
            assert msg.txid == txid
            assert msg.xor_mapped() == s.getsockname()
            s.close()
        finally:
            srv.close()

    def test_srflx_gathering(self):
        srv = StunServer()
        try:
            a = IceAgent(controlling=True, stun_server=srv.addr)
            cands = a.gather()
            srflx = [c for c in cands if c.typ == "srflx"]
            assert srflx, [c.to_sdp() for c in cands]
            # on localhost the reflexive address is our own port
            assert srflx[0].port == a.port
            a.close()
        finally:
            srv.close()


class TestIceAgents:
    def _connect_pair(self):
        a = IceAgent(controlling=True)
        b = IceAgent(controlling=False)
        ca, cb = a.gather(), b.gather()
        a.set_remote_credentials(b.local_ufrag, b.local_pwd)
        b.set_remote_credentials(a.local_ufrag, a.local_pwd)
        for c in cb:
            a.add_remote_candidate(c)
        for c in ca:
            b.add_remote_candidate(c)
        a.start()
        b.start()
        for _ in range(200):
            if a.state == "connected" and b.state == "connected":
                break
            time.sleep(0.02)
        return a, b

    def test_connectivity_checks_nominate(self):
        a, b = self._connect_pair()
        try:
            assert a.state == "connected", a.state
            assert b.state == "connected", b.state
            assert a.selected is not None and b.selected is not None
        finally:
            a.close()
            b.close()

    def test_media_flows_over_selected_pair(self):
        a, b = self._connect_pair()
        try:
            payload = b"\x80" + os.urandom(63)    # RTP-looking
            a.send(payload)
            got = b.recv(timeout=2.0)
            assert got == payload
            b.send(b"\x80" + b"reply")
            assert a.recv(timeout=2.0) == b"\x80" + b"reply"
        finally:
            a.close()
            b.close()

    def test_trickle_candidates(self):
        """Candidates arriving AFTER checks start still connect."""
        a = IceAgent(controlling=True)
        b = IceAgent(controlling=False)
        ca, cb = a.gather(), b.gather()
        a.set_remote_credentials(b.local_ufrag, b.local_pwd)
        b.set_remote_credentials(a.local_ufrag, a.local_pwd)
        a.start()
        b.start()
        time.sleep(0.2)                 # checks running, no pairs yet
        for c in cb:
            a.add_remote_candidate(c)
        for c in ca:
            b.add_remote_candidate(c)
        for _ in range(200):
            if a.state == "connected" and b.state == "connected":
                break
            time.sleep(0.02)
        try:
            assert a.state == "connected" and b.state == "connected"
        finally:
            a.close()
            b.close()

    def test_wrong_credentials_never_connect(self):
        a = IceAgent(controlling=True)
        b = IceAgent(controlling=False)
        ca, cb = a.gather(), b.gather()
        a.set_remote_credentials("bogus", "wrong-password-xx")
        b.set_remote_credentials(a.local_ufrag, a.local_pwd)
        for c in cb:
            a.add_remote_candidate(c)
        for c in ca:
            b.add_remote_candidate(c)
        a.start()
        b.start()
        time.sleep(1.0)
        try:
            assert a.state != "connected"
        finally:
            a.close()
            b.close()


def _peer_proc(offer_text, answer_q, done_q):
    """Answerer in a separate process: SDP via queues (the
    out-of-band signalling channel)."""
    from gstreamer_tpu.core.element import element_factory_make
    from gstreamer_tpu.net.sdp import SDPMessage
    from gstreamer_tpu.net.webrtc import WebRTCSessionDescription
    b = element_factory_make("webrtcbin")
    offer = WebRTCSessionDescription(
        "offer", SDPMessage.parse(offer_text))
    b.set_remote_description(offer)
    answer = b.create_answer()
    b.set_local_description(answer)
    answer_q.put(answer.as_text())
    deadline = time.time() + 15.0
    while time.time() < deadline:
        if b.connection_state in ("connected", "failed"):
            break
        time.sleep(0.05)
    got = []
    if b.connection_state == "connected":
        for _ in range(40):
            got = b.pull_received()
            if got:
                break
            time.sleep(0.1)
    done_q.put((b.connection_state, got[0] if got else None))
    b.stop()


@needs_ssl
class TestWebRTCCrossProcess:
    def test_two_processes_exchange_encrypted_media(self):
        """The VERDICT 'done' bar: two webrtcbins in separate
        processes exchange SDP over a queue channel, ICE connectivity
        checks run over real UDP sockets, DTLS-SRTP media flows, and
        the decrypted frame arrives."""
        from gstreamer_tpu.core.buffer import Buffer
        from gstreamer_tpu.core.element import element_factory_make
        ctx = mp.get_context("spawn")
        answer_q = ctx.Queue()
        done_q = ctx.Queue()
        a = element_factory_make("webrtcbin")
        a.add_transceiver("sendrecv", "audio", pt=0,
                          encoding_name="PCMU", clock_rate=8000)
        offer = a.create_offer()
        a.set_local_description(offer)
        proc = ctx.Process(target=_peer_proc,
                           args=(offer.as_text(), answer_q, done_q))
        proc.start()
        try:
            from gstreamer_tpu.net.sdp import SDPMessage
            from gstreamer_tpu.net.webrtc import \
                WebRTCSessionDescription
            answer_text = answer_q.get(timeout=30)
            a.set_remote_description(WebRTCSessionDescription(
                "answer", SDPMessage.parse(answer_text)))
            for _ in range(200):
                if a.connection_state in ("connected", "failed"):
                    break
                time.sleep(0.05)
            assert a.connection_state == "connected", \
                a.connection_state
            pkt = struct.pack("!BBHII", 0x80, 0, 42, 1000, 0xABCD) \
                + b"\x55" * 40
            deadline = time.time() + 10.0
            state = payload = None
            while time.time() < deadline:
                a.render(Buffer(data=[pkt], batch=1))
                try:
                    state, payload = done_q.get(timeout=0.5)
                    break
                except Exception:
                    continue
            assert state == "connected", state
            assert payload == pkt
        finally:
            proc.join(timeout=10)
            if proc.is_alive():
                proc.terminate()
            a.stop()
