"""Siren7 (G.722.1 16 kHz): codec roundtrip, reference-oracle interop,
elements, RTP pay/depay.

The interop tests compile the reference's bundled libsiren
(gst-plugins-bad/gst/siren/*.c) into /tmp as a behavioral ORACLE —
nothing from it ships in this repo; it only cross-checks that the
clean-room implementation in gstreamer_tpu/codecs/siren.py speaks the
same wire format.  Skipped when no C toolchain is available.
"""

import ctypes
import os
import subprocess
import tempfile

import numpy as np
import pytest

from gstreamer_tpu.codecs import siren
from gstreamer_tpu.core.parse import parse_launch

_SIREN_REF = "/root/reference/subprojects/gst-plugins-bad/gst/siren"


def _speechish(n=16000 * 2):
    t = np.arange(n) / 16000.0
    sig = (6000 * np.sin(2 * np.pi * 220 * t)
           + 3000 * np.sin(2 * np.pi * 440 * t)
           + 1500 * np.sin(2 * np.pi * 880 * t))
    sig *= 0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)
    return np.round(sig).astype(np.int16)


def _snr(ref, got):
    n = min(len(ref), len(got))
    a = ref[:n].astype(np.float64)
    b = got[:n].astype(np.float64)
    return 10 * np.log10(np.sum(a * a) / max(np.sum((a - b) ** 2), 1e-9))


@pytest.fixture(scope="module")
def oracle():
    """Compile the reference siren library as a test oracle."""
    if not os.path.isdir(_SIREN_REF):
        pytest.skip("reference siren sources not available")
    d = tempfile.mkdtemp(prefix="siren_oracle_")
    so = os.path.join(d, "libsiren_oracle.so")
    srcs = [os.path.join(_SIREN_REF, f) for f in
            ("common.c", "dct4.c", "rmlt.c", "huffman.c",
             "decoder.c", "encoder.c")]
    try:
        subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so]
                       + srcs + ["-I", _SIREN_REF, "-lm"],
                       check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        pytest.skip("cannot compile siren oracle")
    lib = ctypes.CDLL(so)
    lib.Siren7_NewEncoder.restype = ctypes.c_void_p
    lib.Siren7_NewDecoder.restype = ctypes.c_void_p
    return lib


def _ref_encode(lib, x):
    enc = lib.Siren7_NewEncoder(16000)
    out = b""
    for i in range(0, len(x) // 320 * 320, 320):
        fout = ctypes.create_string_buffer(40)
        rc = lib.Siren7_EncodeFrame(
            ctypes.c_void_p(enc), x[i:i + 320].astype("<i2").tobytes(),
            fout)
        assert rc == 0
        out += fout.raw
    lib.Siren7_CloseEncoder(ctypes.c_void_p(enc))
    return out


def _ref_decode(lib, data):
    dec = lib.Siren7_NewDecoder(16000)
    outs = []
    for i in range(0, len(data) // 40 * 40, 40):
        fout = ctypes.create_string_buffer(640)
        rc = lib.Siren7_DecodeFrame(
            ctypes.c_void_p(dec), data[i:i + 40], fout)
        assert rc == 0
        outs.append(np.frombuffer(fout.raw, "<i2"))
    lib.Siren7_CloseDecoder(ctypes.c_void_p(dec))
    return np.concatenate(outs)


class TestSirenCodec:
    def test_frame_size(self):
        x = _speechish(3200)
        bs = siren.encode(x)
        assert len(bs) == 10 * 40  # 20 ms -> 40 bytes at 16 kbit/s
        y = siren.decode(bs)
        assert y.shape == (3200,) and y.dtype == np.int16

    def test_roundtrip_snr(self):
        x = _speechish()
        y = siren.decode(siren.encode(x))
        # one-frame algorithmic delay; skip codec startup
        assert _snr(x[640:-320], y[960:]) > 15.0

    def test_rmlt_perfect_reconstruction(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(320 * 6) * 1000
        enc_old = np.zeros(160)
        dec_old = np.zeros(160)
        out = []
        for i in range(6):
            c = siren.rmlt_encode(x[i * 320:(i + 1) * 320].copy(),
                                  enc_old)
            out.append(siren.rmlt_decode(c, dec_old))
        y = np.concatenate(out)
        np.testing.assert_allclose(y[320:], x[:-320], atol=1e-6)

    def test_silence(self):
        y = siren.decode(siren.encode(np.zeros(1600, np.int16)))
        assert np.max(np.abs(y.astype(int))) <= 1

    def test_garbage_frames_do_not_crash(self):
        rng = np.random.default_rng(5)
        blob = rng.integers(0, 256, 40 * 20).astype(np.uint8).tobytes()
        y = siren.decode(blob)
        assert y.shape == (320 * 20,)


class TestSirenOracle:
    def test_encoder_bit_identical(self, oracle):
        x = _speechish()
        assert siren.encode(x) == _ref_encode(oracle, x)

    def test_decoder_matches_reference(self, oracle):
        x = _speechish()
        bs = _ref_encode(oracle, x)
        ref = _ref_decode(oracle, bs).astype(int)
        got = siren.decode(bs).astype(int)
        assert np.max(np.abs(ref - got[:len(ref)])) <= 1

    def test_cross_interop(self, oracle):
        x = _speechish()
        # my encoder -> reference decoder
        y1 = _ref_decode(oracle, siren.encode(x))
        assert _snr(x[640:-320], y1[960:]) > 15.0
        # reference encoder -> my decoder
        y2 = siren.decode(_ref_encode(oracle, x))
        assert _snr(x[640:-320], y2[960:]) > 15.0

    def test_fullscale_no_overflow(self, oracle):
        t = np.arange(6400) / 16000.0
        x = (np.sin(2 * np.pi * 1000 * t) * 32767).astype(np.int16)
        assert siren.encode(x) == _ref_encode(oracle, x)


class TestSirenElements:
    def test_pipeline_roundtrip(self):
        p = parse_launch(
            "audiotestsrc num-buffers=10 samplesperbuffer=320 "
            "wave=sine freq=440 volume=0.4 ! "
            "audio/x-raw,format=S16LE,rate=16000,channels=1 ! "
            "sirenenc ! sirendec ! appsink name=out")
        p.run()
        outs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            assert s.caps[0].name == "audio/x-raw"
            outs.append(np.asarray(s.buffer.data).reshape(-1))
        got = np.concatenate(outs)
        assert len(got) == 3200
        # regenerate the source for comparison
        g = parse_launch(
            "audiotestsrc num-buffers=10 samplesperbuffer=320 "
            "wave=sine freq=440 volume=0.4 ! "
            "audio/x-raw,format=S16LE,rate=16000,channels=1 ! "
            "appsink name=out")
        g.run()
        want = np.concatenate(
            [np.asarray(s.buffer.data).reshape(-1)
             for s in iter(g.get_by_name("out").pull_sample, None)])
        assert _snr(want[640:-320], got[960:]) > 10.0

    def test_coded_caps(self):
        p = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=640 ! "
            "audio/x-raw,format=S16LE,rate=16000,channels=1 ! "
            "sirenenc ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        caps = s.caps[0]
        assert caps.name == "audio/x-siren"
        assert caps["dct-length"] == 320
        blob = s.buffer.data
        blob = blob if isinstance(blob, (bytes, bytearray)) \
            else np.asarray(blob).tobytes()
        assert len(blob) % 40 == 0

    def test_rtp_roundtrip(self):
        p = parse_launch(
            "audiotestsrc num-buffers=10 samplesperbuffer=320 "
            "wave=sine freq=300 volume=0.5 ! "
            "audio/x-raw,format=S16LE,rate=16000,channels=1 ! "
            "sirenenc ! rtpsirenpay mtu=120 ! rtpsirendepay ! "
            "sirendec ! appsink name=out")
        p.run()
        outs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data).reshape(-1))
        got = np.concatenate(outs)
        assert len(got) == 3200
        assert np.max(np.abs(got.astype(int))) > 1000  # real audio


class TestAptx:
    """openaptxenc/openaptxdec (libavcodec-backed, mirroring the
    reference's libopenaptx wrapper architecture)."""

    def _roundtrip(self, hd):
        import pytest as _pytest
        from gstreamer_tpu.native import av as native_av
        if not (native_av.available() and native_av.have_codec("aptx")):
            _pytest.skip("libavcodec aptx unavailable")
        p = parse_launch(
            "audiotestsrc num-buffers=20 samplesperbuffer=1024 "
            "wave=sine freq=440 volume=0.4 ! "
            "audio/x-raw,format=F32LE,rate=44100,channels=2 ! "
            f"openaptxenc hd={'true' if hd else 'false'} ! "
            "openaptxdec ! appsink name=out")
        p.run()
        outs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            assert s.caps[0].name == "audio/x-raw"
            outs.append(np.asarray(s.buffer.data))
        got = np.concatenate(outs)
        assert got.shape[1] == 2 and got.shape[0] > 15000
        # steady-state region should carry the sine at high fidelity
        seg = got[4096:16384, 0].astype(np.float64)
        assert np.max(np.abs(seg)) > 0.3

    def test_aptx_roundtrip(self):
        self._roundtrip(False)

    def test_aptx_hd_roundtrip(self):
        self._roundtrip(True)

    def test_coded_caps(self):
        import pytest as _pytest
        from gstreamer_tpu.native import av as native_av
        if not (native_av.available() and native_av.have_codec("aptx")):
            _pytest.skip("libavcodec aptx unavailable")
        p = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=1024 ! "
            "audio/x-raw,format=F32LE,rate=48000,channels=2 ! "
            "openaptxenc ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert s.caps[0].name == "audio/aptx"
