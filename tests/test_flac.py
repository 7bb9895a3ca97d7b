"""FLAC codec: spec conformance, Python/native bit-identity,
roundtrips, element pipelines."""

import numpy as np
import pytest

from gstreamer_tpu.codecs import flac as pyflac
from gstreamer_tpu.core.parse import parse_launch


def _signal(n, ch=2, amp=3000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    base = amp * np.sin(2 * np.pi * 440 * t / 44100) \
        + rng.standard_normal(n) * 40
    cols = [base * (0.5 + 0.5 * c) for c in range(ch)]
    return np.stack(cols, -1).astype(np.int64)


class TestSpecBits:
    def test_crc_vectors(self):
        # CRC-8 poly 0x07: crc8("123456789") == 0xF4 (standard vector)
        assert pyflac.crc8(b"123456789") == 0xF4
        # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect) == 0xFEE8
        assert pyflac.crc16(b"123456789") == 0xFEE8

    def test_stream_marker_and_streaminfo(self):
        x = _signal(5000, ch=1)
        blob = pyflac.encode(x, 22050, bps=16)
        assert blob[:4] == b"fLaC"
        si, off = pyflac.parse_stream_header(blob)
        assert si.sample_rate == 22050
        assert si.channels == 1
        assert si.bps == 16
        assert si.total_samples == 5000
        import hashlib
        assert si.md5 == hashlib.md5(
            x.astype("<i2").tobytes()).digest()

    def test_utf8_coded_numbers(self):
        from gstreamer_tpu.codecs.flac import (_BitReader, _BitWriter,
                                               _read_utf8, _write_utf8)
        for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF,
                  (1 << 31) - 1, (1 << 36) - 1):
            bw = _BitWriter()
            _write_utf8(bw, v)
            assert _read_utf8(_BitReader(bw.get_bytes())) == v


class TestRoundtrip:
    @pytest.mark.parametrize("ch", [1, 2])
    @pytest.mark.parametrize("bps", [8, 16, 24])
    def test_exact(self, ch, bps):
        amp = (1 << (bps - 2)) - 1
        x = (_signal(9000, ch=ch).astype(np.float64)
             * (amp / 4000)).astype(np.int64)
        blob = pyflac.encode(x, 44100, bps=bps)
        got, si = pyflac.decode(blob)
        np.testing.assert_array_equal(got, x)
        assert len(blob) < x.size * ((bps + 7) // 8)   # compresses

    def test_constant_blocks(self):
        x = np.full((10000, 2), 123, np.int64)
        blob = pyflac.encode(x, 8000, bps=16)
        got, _ = pyflac.decode(blob)
        np.testing.assert_array_equal(got, x)
        assert len(blob) < 300                    # constant subframes

    def test_noise_verbatim_path(self):
        rng = np.random.default_rng(3)
        x = rng.integers(-32768, 32768, (5000, 1)).astype(np.int64)
        blob = pyflac.encode(x, 8000, bps=16)
        got, _ = pyflac.decode(blob)
        np.testing.assert_array_equal(got, x)

    def test_corrupt_frame_rejected(self):
        x = _signal(5000, ch=1)
        blob = bytearray(pyflac.encode(x, 44100))
        blob[100] ^= 0xFF                        # flip a frame byte
        with pytest.raises(ValueError):
            pyflac.decode(bytes(blob))


class TestNativeParity:
    def test_streams_bit_identical(self):
        from gstreamer_tpu.native import flac as nflac
        if nflac.get_lib() is None:
            pytest.skip("native flac unavailable")
        for ch, bps, seed in ((1, 16, 0), (2, 16, 1), (2, 24, 2)):
            amp = (1 << (bps - 2)) - 1
            x = (_signal(10000, ch=ch, seed=seed).astype(np.float64)
                 * (amp / 4000)).astype(np.int64)
            gold = pyflac.encode(x, 44100, bps=bps)
            nat = nflac.encode(x, 44100, bps=bps)
            assert nat == gold
            dec = nflac.decode(gold)
            assert dec is not None
            np.testing.assert_array_equal(dec[0], x)

    def test_native_decodes_lpc_streams(self):
        """Native must handle subframe types the encoder never emits:
        hand-build an LPC + mid/side stream via the Python writer."""
        from gstreamer_tpu.codecs.flac import (_BitWriter, _write_utf8,
                                               crc8, crc16)
        from gstreamer_tpu.native import flac as nflac
        if nflac.get_lib() is None:
            pytest.skip("native flac unavailable")
        # 1-order LPC with coef=1, shift=0 == fixed order 1
        n = 192
        x = (np.sin(np.arange(n) / 5) * 1000).astype(np.int64)
        head = _BitWriter()
        head.write(0x664C6143, 32)
        head.write(1, 1); head.write(0, 7); head.write(34, 24)
        head.write(n, 16); head.write(n, 16)
        head.write(0, 24); head.write(0, 24)
        head.write(8000, 20); head.write(0, 3); head.write(15, 5)
        head.write(n, 36)
        blob = bytearray(head.get_bytes()) + b"\0" * 16
        bw = _BitWriter()
        bw.write(0x3FFE, 14); bw.write(0, 2)
        bw.write(1, 4)                    # blocksize 192
        bw.write(4, 4)                    # 8000 Hz
        bw.write(0, 4); bw.write(4, 3); bw.write(0, 1)
        _write_utf8(bw, 0)
        hdr = bw.get_bytes()
        bw2 = _BitWriter(); bw2._out = bytearray(hdr)
        bw2.write(crc8(hdr), 8)
        # LPC subframe order 1, precision 2, shift 0, coef 1
        bw2.write(0, 1); bw2.write(32, 6); bw2.write(0, 1)
        bw2.write(int(x[0]), 16)
        bw2.write(1, 4)                   # precision-1 = 1 -> 2 bits
        bw2.write(0, 5)                   # shift 0
        bw2.write(1, 2)                   # coef = 1
        res = np.diff(x)
        bw2.write(0, 2); bw2.write(0, 4)
        from gstreamer_tpu.codecs.flac import (_best_rice_param,
                                               _write_rice)
        k, _ = _best_rice_param(res)
        bw2.write(k, 4)
        _write_rice(bw2, res, k)
        body = bw2.get_bytes()
        import struct
        frame = body + struct.pack(">H", crc16(body))
        blob += frame
        got, si = pyflac.decode(bytes(blob))
        np.testing.assert_array_equal(got[:, 0], x)
        nat = nflac.decode(bytes(blob))
        assert nat is not None
        np.testing.assert_array_equal(nat[0][:, 0], x)


class TestFlacElements:
    def test_pipeline_roundtrip(self, tmp_path):
        path = tmp_path / "a.flac"
        p = parse_launch(
            f"audiotestsrc num-buffers=10 samplesperbuffer=1000 "
            f"wave=sine ! audio/x-raw,format=S16LE,rate=44100,"
            f"channels=2 ! flacenc location={path}")
        p.run()
        p.set_state("null")
        assert path.exists() and open(path, "rb").read(4) == b"fLaC"

        d = parse_launch(
            f"flacdec location={path} ! appsink name=out")
        d.run()
        outs = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data))
        got = np.concatenate(outs, axis=0)
        assert got.dtype == np.int16

        g = parse_launch(
            "audiotestsrc num-buffers=10 samplesperbuffer=1000 "
            "wave=sine ! audio/x-raw,format=S16LE,rate=44100,"
            "channels=2 ! appsink name=out")
        g.run()
        wants = []
        while (s := g.get_by_name("out").pull_sample()) is not None:
            wants.append(np.asarray(s.buffer.data))
        np.testing.assert_array_equal(got, np.concatenate(wants, axis=0))

    def test_caps_from_file(self, tmp_path):
        path = tmp_path / "m.flac"
        p = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=500 ! "
            f"audio/x-raw,format=S16LE,rate=22050,channels=1 ! "
            f"flacenc location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"flacdec location={path} ! appsink name=out")
        d.run()
        s = d.get_by_name("out").pull_sample()
        caps = s.caps[0]
        assert caps["rate"] == 22050 and caps["channels"] == 1
