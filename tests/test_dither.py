"""Video dither: exact video-dither.c semantics."""

import numpy as np
import pytest

from gstreamer_tpu.video.dither import (BAYER_MAP, VideoDither,
                                        make_converter_dither)


class TestOrdered:
    def test_bayer_plane_tiles_and_shifts(self):
        d = VideoDither("bayer", False, 16, [0, 64, 64, 64])
        p = d._bayer_plane(1, 20, 40)
        assert p[0, 0] == BAYER_MAP[0, 0] >> 2   # shift=6 -> v >> (8-6)
        assert p[16, 16] == p[0, 0]
        assert p[3, 7] == BAYER_MAP[3, 7] >> 2

    def test_ordered_u16_mask_gold(self):
        # ordered_4u16_mask: p = min(p + e, 65535) & ~mask
        rng = np.random.RandomState(0)
        d = VideoDither("bayer", False, 16, [0, 64, 64, 64])
        c = rng.randint(0, 65536, (1, 18, 22)).astype(np.int32)
        out = d.apply(np, (None, c, c.copy(), c.copy()), 18, 22)[1]
        pat = d._bayer_plane(1, 18, 22)
        gold = np.minimum(c + pat, 65535) & ~63
        assert np.array_equal(out, gold)

    def test_ordered_u8_saturated_add(self):
        d = VideoDither("bayer", False, 8, [0, 16, 16, 16])
        c = np.full((1, 16, 16), 250, np.int32)
        out = d.apply(np, (None, c, c, c), 16, 16)[1]
        assert out.max() == 255   # addusb saturates
        assert out.min() == 250   # pattern value 0 at (0,0)

    def test_device_matches_numpy(self):
        import jax.numpy as jnp
        rng = np.random.RandomState(1)
        d = VideoDither("bayer", False, 16, [0, 64, 64, 64])
        c = rng.randint(0, 65536, (2, 17, 33)).astype(np.int32)
        gold = d.apply(np, (None, c, c, c), 17, 33)
        dev = d.apply(jnp, (None,) + (jnp.asarray(c),) * 3, 17, 33)
        for g, v in zip(gold[1:], dev[1:]):
            assert np.array_equal(np.asarray(g), np.asarray(v))


class TestVerterr:
    def _gold(self, p, mask, maxv):
        # dither_verterr: per column, v = p + e; e = v & m; p = v & ~m
        out = p.astype(np.int64).copy()
        e = np.zeros(p.shape[-1], np.int64)
        for r in range(p.shape[0]):
            v = out[r] + e
            e = v & mask
            out[r] = np.minimum(v & ~mask, maxv)
        return out

    def test_matches_gold_and_device(self):
        import jax.numpy as jnp
        rng = np.random.RandomState(2)
        d = VideoDither("verterr", False, 16, [0, 16, 16, 16])
        c = rng.randint(0, 65536, (12, 9)).astype(np.int32)
        gold = self._gold(c, 15, 65535)
        out_np = d.apply(np, (None, c[None], c[None], c[None]), 12, 9)[1][0]
        out_dev = d.apply(jnp, (None,) + (jnp.asarray(c[None]),) * 3, 12, 9)[1][0]
        assert np.array_equal(out_np, gold)
        assert np.array_equal(np.asarray(out_dev), gold)


class TestSerial:
    def test_floyd_steinberg_preserves_mean(self):
        rng = np.random.RandomState(3)
        d = VideoDither("floyd-steinberg", False, 16, [0, 256, 256, 256])
        c = rng.randint(0, 65536, (1, 32, 32)).astype(np.int32)
        out = d.apply(np, (None, c, c.copy(), c.copy()), 32, 32)[1]
        # quantized to multiples of 256 (or the 65535 saturation clamp,
        # which the reference's MIN(v & ~mp, 65535) also produces)
        assert np.all((out % 256 == 0) | (out == 65535))
        assert abs(float(out.mean()) - float(c.mean())) < 200

    def test_sierra_lite_quantizes(self):
        d = VideoDither("sierra-lite", False, 8, [0, 8, 8, 8])
        c = np.full((1, 8, 8), 100, np.int32)
        out = d.apply(np, (None, c, c, c), 8, 8)[1]
        assert np.all(out % 8 == 0)
        assert abs(float(out.mean()) - 100) < 8


class TestConverterWiring:
    def test_no_dither_for_8bit_outputs(self):
        from gstreamer_tpu.video.format import format_info
        assert make_converter_dither("bayer", 1, format_info("RGB"), 8) is None
        assert make_converter_dither("none", 1, format_info("P010_10LE"),
                                     16) is None

    def test_dither_fires_for_10bit_outputs(self):
        from gstreamer_tpu.video.format import format_info
        d = make_converter_dither("bayer", 1, format_info("I420_10LE"), 16)
        assert d is not None
        assert d.mask[1] == 63   # 1<<(16-10) - 1

    def test_converter_10bit_output_dithers_by_default(self):
        from gstreamer_tpu.video.converter import VideoConverter
        from gstreamer_tpu.video.info import VideoInfo
        ii = VideoInfo(format="I420", width=32, height=16)
        oi = VideoInfo(format="I420_10LE", width=32, height=16)
        vc = VideoConverter(ii, oi)
        assert vc._plan["dither"] is not None
        rng = np.random.RandomState(4)
        planes = (rng.randint(0, 256, (1, 16, 32), np.uint8),
                  rng.randint(0, 256, (1, 8, 16), np.uint8),
                  rng.randint(0, 256, (1, 8, 16), np.uint8))
        gold = vc.convert_ref(planes)
        dev = vc.convert(planes)
        for g, d_ in zip(gold, dev):
            assert np.array_equal(np.asarray(g), np.asarray(d_))
        # explicit dither-method=none differs (the bayer offsets move
        # values across quantization boundaries)
        vc0 = VideoConverter(ii, oi, {"dither-method": "none"})
        gold0 = vc0.convert_ref(planes)
        assert not all(np.array_equal(np.asarray(a), np.asarray(b))
                       for a, b in zip(gold, gold0))

    def test_serial_dither_convert_falls_back_to_host(self):
        from gstreamer_tpu.video.converter import VideoConverter
        from gstreamer_tpu.video.info import VideoInfo
        ii = VideoInfo(format="I420", width=16, height=8)
        oi = VideoInfo(format="I420_10LE", width=16, height=8)
        vc = VideoConverter(ii, oi, {"dither-method": "floyd-steinberg"})
        planes = (np.full((1, 8, 16), 77, np.uint8),
                  np.full((1, 4, 8), 90, np.uint8),
                  np.full((1, 4, 8), 150, np.uint8))
        gold = vc.convert_ref(planes)
        dev = vc.convert(planes)
        for g, d_ in zip(gold, dev):
            assert np.array_equal(np.asarray(g), np.asarray(d_))
