"""Clean-room MPEG audio decoder parity vs libmpg123 (audio_oracle) —
the same library the reference's mpg123audiodec wraps
(gst-plugins-ugly/ext/mpg123/gstmpg123audiodec.c:1).

Vectors come from libmp3lame, the reference repo's own .mp3/.mp2 test
files, and hand-built Layer I frames."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import audio_oracle as ao  # noqa: E402

from gstreamer_tpu import parse_launch  # noqa: E402
from gstreamer_tpu.codecs import mp3 as M  # noqa: E402

needs_lame = pytest.mark.skipif(
    not (ao.have_lame() and ao.have_mpg123()),
    reason="system libmp3lame/libmpg123 missing")
needs_mpg123 = pytest.mark.skipif(not ao.have_mpg123(),
                                  reason="system libmpg123 missing")

_REF_FILES = "/root/reference/subprojects"


def snr_db(gold, mine):
    n = min(len(gold), len(mine))
    g = np.asarray(gold[:n], np.float64)
    p = np.asarray(mine[:n], np.float64)
    err = p - g
    sig = max(float((g ** 2).mean()), 1e-300)
    return 10 * np.log10(sig / max(float((err ** 2).mean()), 1e-300))


def _vector(sig, rate, kbps):
    blob = ao.lame_encode(
        (np.clip(sig, -1, 1) * 32767).astype(np.int16), rate, kbps)
    assert blob is not None
    return blob


@needs_lame
class TestLayer3Parity:
    """>=60 dB SNR vs libmpg123 (measured parity ~130 dB)."""

    @pytest.mark.parametrize("rate,kbps", [
        (44100, 128), (44100, 320), (48000, 192), (32000, 64),
        (22050, 64), (24000, 96), (16000, 32), (8000, 16),
    ])
    def test_rates_and_bitrates(self, rate, kbps):
        t = np.arange(rate, dtype=np.float64) / rate
        sig = np.stack([np.sin(2 * np.pi * 440 * t) * 0.5,
                        np.sin(2 * np.pi * 660 * t) * 0.4], 1)
        blob = _vector(sig, rate, kbps)
        gold, grate, gch = ao.mpg123_decode(blob)
        pcm, r, ch = M.decode(blob)
        assert (r, ch) == (grate, gch)
        assert len(pcm) == len(gold)
        assert snr_db(gold, pcm) > 60

    def test_mono(self):
        t = np.arange(44100, dtype=np.float64) / 44100
        blob = _vector((np.sin(2 * np.pi * 440 * t) * 0.5)[:, None],
                       44100, 128)
        gold, _, gch = ao.mpg123_decode(blob)
        pcm, _, ch = M.decode(blob)
        assert ch == gch == 1
        assert snr_db(gold, pcm) > 60

    def test_transients_short_blocks(self):
        rng = np.random.default_rng(7)
        sig = rng.standard_normal((44100, 2)) * 0.02
        for k in range(0, 44100, 3000):
            sig[k:k + 60] += rng.standard_normal(
                (min(60, 44100 - k), 2)) * 0.6
        blob = _vector(sig, 44100, 128)
        gold, _, _ = ao.mpg123_decode(blob)
        pcm, _, _ = M.decode(blob)
        assert snr_db(gold, pcm) > 60

    def test_noise_heavy_reservoir(self):
        rng = np.random.default_rng(5)
        for rate, kbps in ((44100, 256), (24000, 96), (22050, 96)):
            sig = rng.standard_normal((rate, 2)) * 0.05
            blob = _vector(sig, rate, kbps)
            gold, _, _ = ao.mpg123_decode(blob)
            pcm, _, _ = M.decode(blob)
            assert snr_db(gold, pcm) > 60, (rate, kbps)


@needs_mpg123
class TestReferenceFiles:
    @pytest.mark.parametrize("rel", [
        "gst-plugins-base/tests/files/test.mp3",
        "gst-plugins-good/tests/files/cbr_stream.mp3",
        "gst-plugins-good/tests/files/vbr_stream.mp3",
    ])
    def test_mp3_files(self, rel):
        path = os.path.join(_REF_FILES, rel)
        if not os.path.exists(path):
            pytest.skip("reference file absent")
        data = open(path, "rb").read()
        gold, grate, gch = ao.mpg123_decode(data)
        pcm, r, ch = M.decode(data)
        assert (r, ch) == (grate, gch)
        assert len(pcm) == len(gold)
        assert snr_db(gold, pcm) > 60

    def test_lame_gapless_tag(self):
        """Xing/LAME delay+padding trimming must match mpg123's
        default gapless behavior sample-exactly."""
        path = os.path.join(
            _REF_FILES, "gst-plugins-good/tests/files/"
            "sine-1009ms-1ch-32000hz-gapless-with-lame-tag.mp3")
        if not os.path.exists(path):
            pytest.skip("reference file absent")
        data = open(path, "rb").read()
        gold, _, _ = ao.mpg123_decode(data)
        pcm, _, _ = M.decode(data)
        assert len(pcm) == len(gold) == 32288
        assert snr_db(gold, pcm) > 60

    def test_layer2_stream(self):
        path = os.path.join(_REF_FILES,
                            "gst-plugins-good/tests/files/stream.mp2")
        if not os.path.exists(path):
            pytest.skip("reference file absent")
        data = open(path, "rb").read()
        gold, grate, gch = ao.mpg123_decode(data)
        pcm, r, ch = M.decode(data)
        assert (r, ch) == (grate, gch)
        assert len(pcm) == len(gold)
        assert snr_db(gold, pcm) > 60


class _BitW:
    def __init__(self):
        self.bits = []

    def w(self, v, n):
        self.bits += [(v >> (n - 1 - i)) & 1 for i in range(n)]

    def bytes(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def make_layer1_frames(n_frames=8, seed=1):
    """Hand-built MPEG-1 Layer I frames (448 kbps 44.1 kHz mono,
    8-bit allocation everywhere, random codes)."""
    rng = np.random.default_rng(seed)
    frames = b""
    for _ in range(n_frames):
        w = _BitW()
        w.w(0x7FF, 11), w.w(3, 2), w.w(3, 2), w.w(1, 1)
        w.w(14, 4), w.w(0, 2), w.w(0, 1), w.w(0, 1)
        w.w(3, 2), w.w(0, 2), w.w(0, 1), w.w(0, 1), w.w(0, 2)
        for _sb in range(32):
            w.w(7, 4)
        for _sb in range(32):
            w.w(int(rng.integers(0, 63)), 6)
        for _t in range(12):
            for _sb in range(32):
                w.w(int(rng.integers(0, 255)), 8)
        blob = w.bytes()
        size = (12 * 448000 // 44100) * 4
        frames += blob + b"\x00" * (size - len(blob))
    return frames


@needs_mpg123
class TestLayer1:
    def test_layer1_parity(self):
        data = make_layer1_frames()
        gold, grate, gch = ao.mpg123_decode(data)
        pcm, r, ch = M.decode(data)
        assert (r, ch) == (grate, gch) == (44100, 1)
        assert len(pcm) == len(gold)
        assert snr_db(gold, pcm) > 60


class TestRobustness:
    def test_garbage_resyncs(self):
        data = make_layer1_frames(4)
        noisy = b"\x00garbage" + data[:300] + b"\xff\xfb" + data
        try:
            pcm, _, _ = M.decode(noisy)
            assert len(pcm) > 0
        except ValueError:
            pass                               # typed failure is fine

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            M.decode(b"")
        with pytest.raises(ValueError):
            M.decode(b"\x00" * 1000)

    def test_header_validation(self):
        with pytest.raises(ValueError):
            M.FrameHeader(b"\x00\x00\x00\x00")
        with pytest.raises(ValueError):
            M.FrameHeader(b"\xff\xea\x00\x00")  # reserved version
        h = M.FrameHeader(bytes([0xFF, 0xFB, 0x90, 0x00]))
        assert h.layer == 3 and h.rate == 44100 and h.bitrate == 128000


@needs_lame
class TestElement:
    def test_pipeline_decode(self, tmp_path):
        rate = 44100
        t = np.arange(rate // 2, dtype=np.float64) / rate
        sig = np.stack([np.sin(2 * np.pi * 440 * t) * 0.5] * 2, 1)
        blob = _vector(sig, rate, 128)
        path = tmp_path / "t.mp3"
        path.write_bytes(blob)
        gold, _, _ = ao.mpg123_decode(blob)

        p = parse_launch(f"filesrc location={path} ! mpegaudioparse ! "
                         "mpg123audiodec ! appsink name=o")
        p.run()
        sink = p.get_by_name("o")
        got = []
        caps = None
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            caps = s.caps
            got.append(np.asarray(s.buffer.data))
        pcm = np.concatenate(got, axis=0)
        assert int(caps[0]["rate"]) == 44100
        assert int(caps[0]["channels"]) == 2
        assert len(pcm) == len(gold)
        assert snr_db(gold, pcm) > 60
