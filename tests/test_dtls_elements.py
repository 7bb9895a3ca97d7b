"""Standalone DTLS elements (reference gst-plugins-bad/ext/dtls/):
dtlsenc/dtlsdec shared-association handshake + app data,
dtlssrtpenc/dtlssrtpdec keyed from RFC 5764 export,
dtlssrtpdemux first-byte routing."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make as make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net import dtls
from gstreamer_tpu.net.dtls_elements import _release_connection
from gstreamer_tpu.net.rtp import rtp_header

pytestmark = pytest.mark.skipif(
    not dtls.available(), reason="system libssl not available")


def _pkts(buf):
    if buf is None:
        return []
    d = buf.data
    if isinstance(d, (list, tuple)):
        return [bytes(x) if isinstance(x, (bytes, bytearray))
                else bytes(np.asarray(x).ravel()) for x in d]
    return [bytes(np.asarray(d).ravel())]


def _handshake(enc_c, dec_c, enc_s, dec_s, rounds=10):
    """Ferry records between the two associations until complete."""
    for _ in range(rounds):
        for out_enc, in_dec in ((enc_c, dec_s), (enc_s, dec_c)):
            buf = out_enc.host_process(None)
            for rec in _pkts(buf):
                in_dec.host_process(Buffer(data=[rec], batch=1))


class TestDtlsEncDec:
    def test_handshake_and_app_data(self):
        _release_connection("cli"), _release_connection("srv")
        enc_c = make("dtlsenc", connection_id="cli", is_client=True)
        dec_c = make("dtlsdec", connection_id="cli", is_client=True)
        enc_s = make("dtlsenc", connection_id="srv", is_client=False)
        dec_s = make("dtlsdec", connection_id="srv", is_client=False)
        for e in (enc_c, dec_c, enc_s, dec_s):
            e.start()
        _handshake(enc_c, dec_c, enc_s, dec_s)
        assert enc_c._conn().complete and enc_s._conn().complete

        plaintext = b"secret application payload" * 10
        wire = _pkts(enc_c.host_process(Buffer(
            data=np.frombuffer(plaintext, np.uint8), batch=1)))
        assert wire and all(plaintext not in w for w in wire)
        got = b""
        for rec in wire:
            out = dec_s.host_process(Buffer(data=[rec], batch=1))
            for p in _pkts(out):
                got += p
        assert got == plaintext
        _release_connection("cli"), _release_connection("srv")


class TestDtlsSrtp:
    def test_rtp_protected_end_to_end(self):
        _release_connection("sc"), _release_connection("ss")
        enc_c = make("dtlssrtpenc", connection_id="sc",
                     is_client=True)
        dec_c = make("dtlssrtpdec", connection_id="sc",
                     is_client=True)
        enc_s = make("dtlssrtpenc", connection_id="ss",
                     is_client=False)
        dec_s = make("dtlssrtpdec", connection_id="ss",
                     is_client=False)
        for e in (enc_c, dec_c, enc_s, dec_s):
            e.start()
        # srtp-flavored handshake ferry: dec feeds DTLS, enc emits
        for _ in range(10):
            for out_enc, in_dec in ((enc_c, dec_s), (enc_s, dec_c)):
                buf = out_enc.host_process(None)
                for rec in _pkts(buf):
                    in_dec.host_process(Buffer(data=[rec], batch=1))
        assert enc_c._conn().complete and enc_s._conn().complete

        media = [rtp_header(96, 10 + i, 1000 + 160 * i, 0xFEED)
                 + bytes([i]) * 50 for i in range(3)]
        wire = _pkts(enc_c.host_process(Buffer(data=media, batch=3)))
        srtp_pkts = [w for w in wire if w and 128 <= w[0] <= 191]
        assert len(srtp_pkts) == 3
        for orig, prot in zip(media, srtp_pkts):
            assert prot[:12] == orig[:12]        # header in clear
            assert prot[12:12 + 50] != orig[12:]  # payload encrypted
        out = []
        for w in wire:
            res = dec_s.host_process(Buffer(data=[w], batch=1))
            out.extend(_pkts(res))
        assert out == media                      # bit-exact recovery
        _release_connection("sc"), _release_connection("ss")


class TestDtlsSrtpDemux:
    def test_first_byte_routing(self):
        rtp = rtp_header(96, 1, 1234, 0xAA) + b"media"
        dtls_rec = bytes([22, 254, 253]) + bytes(20)   # handshake
        p = parse_launch("appsrc name=in ! application/x-rtp ! "
                         "dtlssrtpdemux name=d ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=[dtls_rec, rtp], batch=2))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert _pkts(s.buffer) == [rtp]
        assert p.get_by_name("d").last_dtls == [dtls_rec]
