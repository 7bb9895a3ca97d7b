"""DTLS-SRTP (RFC 5764) + clean-room SRTP (RFC 3711) tests.

Reference: gst-plugins-bad/ext/dtls/ (OpenSSL agent/connection),
ext/srtp/gstsrtpenc.c / gstsrtpdec.c, ext/webrtc/gstwebrtcbin.c.
"""

import struct
import time

import numpy as np
import pytest

from gstreamer_tpu.net import dtls as D
from gstreamer_tpu.net.srtp import SrtpSession, srtp_kdf

needs_ssl = pytest.mark.skipif(not D.available(),
                               reason="libssl not available")


def make_rtp(seq, ssrc=0x1234, pt=96, ts=1000, payload=b"\xAA" * 64):
    hdr = struct.pack("!BBHII", 0x80, pt, seq & 0xFFFF, ts, ssrc)
    return hdr + payload


@needs_ssl
class TestDtls:
    def test_handshake_and_keys(self):
        a, b = D.DtlsAgent(), D.DtlsAgent()
        cli, srv = D.handshake_pair(a, b)
        assert cli.complete and srv.complete
        assert cli.selected_srtp_profile() == "SRTP_AES128_CM_SHA1_80"
        assert cli.export_srtp_keys() == srv.export_srtp_keys()
        send, recv = cli.srtp_send_recv_keys()
        s2, r2 = srv.srtp_send_recv_keys()
        assert send == r2 and recv == s2

    def test_fingerprint_format(self):
        fp = D.DtlsAgent().fingerprint()
        assert fp.startswith("sha-256 ")
        parts = fp.split(" ", 1)[1].split(":")
        assert len(parts) == 32
        assert all(len(p) == 2 for p in parts)

    def test_distinct_agents_distinct_keys(self):
        k1 = D.handshake_pair(D.DtlsAgent(),
                              D.DtlsAgent())[0].export_srtp_keys()
        k2 = D.handshake_pair(D.DtlsAgent(),
                              D.DtlsAgent())[0].export_srtp_keys()
        assert k1 != k2


@needs_ssl
class TestSrtp:
    KEY = bytes(range(16))
    SALT = bytes(range(14))

    def test_protect_unprotect_roundtrip(self):
        tx = SrtpSession(self.KEY, self.SALT)
        rx = SrtpSession(self.KEY, self.SALT)
        for seq in range(5):
            pkt = make_rtp(seq, payload=bytes([seq]) * 33)
            prot = pkt if False else tx.protect(pkt)
            assert prot != pkt
            assert len(prot) == len(pkt) + SrtpSession.AUTH_TAG_LEN
            # header stays in the clear (RFC 3711 §3.1)
            assert prot[:12] == pkt[:12]
            out = rx.unprotect(prot)
            assert out == pkt

    def test_tamper_detected(self):
        tx = SrtpSession(self.KEY, self.SALT)
        rx = SrtpSession(self.KEY, self.SALT)
        prot = bytearray(tx.protect(make_rtp(1)))
        prot[20] ^= 0xFF
        assert rx.unprotect(bytes(prot)) is None

    def test_wrong_key_rejected(self):
        tx = SrtpSession(self.KEY, self.SALT)
        rx = SrtpSession(bytes(16), self.SALT)
        assert rx.unprotect(tx.protect(make_rtp(1))) is None

    def test_seq_rollover_roc(self):
        tx = SrtpSession(self.KEY, self.SALT)
        rx = SrtpSession(self.KEY, self.SALT)
        for seq in (65534, 65535, 0, 1):      # wraps -> ROC increments
            pkt = make_rtp(seq)
            assert rx.unprotect(tx.protect(pkt)) == pkt
        assert tx._roc[0x1234] == 1

    def test_kdf_labels_differ(self):
        e = srtp_kdf(self.KEY, self.SALT, 0, 16)
        a = srtp_kdf(self.KEY, self.SALT, 1, 20)
        s = srtp_kdf(self.KEY, self.SALT, 2, 14)
        assert len({e, a[:16], s + b"\0\0"}) == 3

    def test_srtp_elements(self):
        from gstreamer_tpu.core.buffer import Buffer
        from gstreamer_tpu.core.element import element_factory_make
        key_hex = (self.KEY + self.SALT).hex()
        enc = element_factory_make("srtpenc", key=key_hex)
        dec = element_factory_make("srtpdec", key=key_hex)
        enc.start()
        dec.start()
        pkts = [make_rtp(i) for i in range(3)]
        out = enc.host_process(Buffer(data=list(pkts), batch=1))
        back = dec.host_process(out)
        assert [bytes(p) for p in back.data] == pkts


@needs_ssl
class TestWebRTCDtlsSrtp:
    def test_end_to_end_encrypted_media(self):
        """Two webrtcbins: JSEP offer/answer with fingerprints, DTLS
        handshake over the media ports, SRTP-protected RTP that
        round-trips — and is NOT plaintext on the wire."""
        from gstreamer_tpu.core.buffer import Buffer
        from gstreamer_tpu.core.element import element_factory_make

        a = element_factory_make("webrtcbin")
        b = element_factory_make("webrtcbin")
        a.add_transceiver("sendrecv", "audio", pt=0,
                          encoding_name="PCMU", clock_rate=8000)
        offer = a.create_offer()
        sdp_text = offer.as_text()
        assert "fingerprint" in sdp_text and "actpass" in sdp_text
        a.set_local_description(offer)
        b.set_remote_description(offer)
        answer = b.create_answer()
        assert "fingerprint" in answer.as_text()
        b.set_local_description(answer)
        a.set_remote_description(answer)
        # wait for both handshakes
        for _ in range(100):
            if (a.connection_state == "connected"
                    and b.connection_state == "connected"):
                break
            time.sleep(0.05)
        assert a.connection_state == "connected", a.connection_state
        assert b.connection_state == "connected", b.connection_state
        assert a._srtp_send is not None

        payload = b"\x42" * 40
        pkt = make_rtp(7, payload=payload)
        a.render(Buffer(data=[pkt], batch=1))
        got = []
        for _ in range(10):
            got = b.pull_received()
            if got:
                break
            time.sleep(0.05)
        assert got and got[0] == pkt
        a.stop()
        b.stop()


@needs_ssl
class TestSrtpHeaderExtension:
    KEY = bytes(range(16))
    SALT = bytes(range(14))

    def make_ext_rtp(self, seq, ext_words=2):
        """RTP with X=1 and an RFC 8285 one-byte-header extension."""
        hdr = struct.pack("!BBHII", 0x90, 96, seq & 0xFFFF, 1000,
                          0x1234)
        ext = struct.pack("!HH", 0xBEDE, ext_words) \
            + bytes(range(4 * ext_words))
        return hdr + ext + b"\x5A" * 33

    def test_extension_stays_cleartext(self):
        """RFC 3711 §3.1: the header extension is authenticated but
        NOT encrypted — required for libsrtp/reference interop."""
        tx = SrtpSession(self.KEY, self.SALT)
        rx = SrtpSession(self.KEY, self.SALT)
        pkt = self.make_ext_rtp(5)
        prot = tx.protect(pkt)
        ext_end = 12 + 4 + 8                  # hdr + ext hdr + 2 words
        assert prot[:ext_end] == pkt[:ext_end]
        assert prot[ext_end:-10] != pkt[ext_end:]   # payload encrypted
        assert rx.unprotect(prot) == pkt

    def test_csrc_plus_extension(self):
        tx = SrtpSession(self.KEY, self.SALT)
        rx = SrtpSession(self.KEY, self.SALT)
        hdr = struct.pack("!BBHII", 0x92, 96, 9, 1000, 0x1234)
        hdr += struct.pack("!II", 0xC0FFEE, 0xBEEF)    # 2 CSRCs
        hdr += struct.pack("!HH", 0xBEDE, 1) + b"\x01\x02\x03\x04"
        pkt = hdr + b"\x77" * 20
        prot = tx.protect(pkt)
        assert prot[:len(hdr)] == hdr
        assert rx.unprotect(prot) == pkt


@needs_ssl
class TestWebRTCSecurity:
    def test_fingerprint_mismatch_fails(self):
        """A peer presenting a cert that doesn't match the signalled
        a=fingerprint must be rejected (RFC 8122 / 5763 §5)."""
        from gstreamer_tpu.core.element import element_factory_make
        a = element_factory_make("webrtcbin")
        b = element_factory_make("webrtcbin")
        a.add_transceiver("sendrecv", "audio", pt=0,
                          encoding_name="PCMU", clock_rate=8000)
        offer = a.create_offer()
        a.set_local_description(offer)
        b.set_remote_description(offer)
        answer = b.create_answer()
        b.set_local_description(answer)
        # tamper: swap the fingerprint the answerer signalled
        bogus = "sha-256 " + ":".join(["00"] * 32)
        for m in answer.sdp.medias:
            m.attributes = [
                (k, bogus if k == "fingerprint" else v)
                for k, v in m.attributes]
        a.set_remote_description(answer)
        for _ in range(100):
            if a.connection_state in ("connected", "failed"):
                break
            time.sleep(0.05)
        assert a.connection_state == "failed"
        a.stop()
        b.stop()

    def test_no_remote_fingerprint_refuses_plaintext(self):
        """enable-dtls=true (default) never degrades to plain RTP."""
        from gstreamer_tpu.core.element import element_factory_make
        from gstreamer_tpu.net.sdp import SDPMessage
        from gstreamer_tpu.net.webrtc import WebRTCSessionDescription
        a = element_factory_make("webrtcbin")
        a.add_transceiver("sendrecv", "audio", pt=0,
                          encoding_name="PCMU", clock_rate=8000)
        offer = a.create_offer()
        a.set_local_description(offer)
        # strip fingerprints from the "answer" (plain-RTP peer)
        b = element_factory_make("webrtcbin", **{"enable-dtls": False})
        b.set_remote_description(offer)
        answer = b.create_answer()
        for m in answer.sdp.medias:
            m.attributes = [(k, v) for k, v in m.attributes
                            if k not in ("fingerprint", "setup")]
        a.set_remote_description(answer)
        time.sleep(0.2)
        assert a.connection_state == "failed"
        a.stop()
        b.stop()

    def test_plain_rtp_requires_explicit_optout(self):
        """Both sides enable-dtls=false -> plain RTP still works."""
        from gstreamer_tpu.core.buffer import Buffer
        from gstreamer_tpu.core.element import element_factory_make
        a = element_factory_make("webrtcbin", **{"enable-dtls": False})
        b = element_factory_make("webrtcbin", **{"enable-dtls": False})
        a.add_transceiver("sendrecv", "audio", pt=0,
                          encoding_name="PCMU", clock_rate=8000)
        offer = a.create_offer()
        assert "fingerprint" not in offer.as_text()
        a.set_local_description(offer)
        b.set_remote_description(offer)
        answer = b.create_answer()
        b.set_local_description(answer)
        a.set_remote_description(answer)
        time.sleep(0.1)
        assert a.connection_state == "connected"
        pkt = make_rtp(3)
        a.render(Buffer(data=[pkt], batch=1))
        got = []
        for _ in range(10):
            got = b.pull_received()
            if got:
                break
            time.sleep(0.05)
        assert got and got[0] == pkt
        a.stop()
        b.stop()
