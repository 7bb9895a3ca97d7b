"""DRM fourcc interop (video-info-dma.c), DSD conversion (gstdsd.c) and
IEC 61937 payloading (gstaudioiec61937.c)."""

import numpy as np
import pytest

from gstreamer_tpu.audio.dsd import (BIT_REVERSE, DsdInfo, dsd_convert,
                                     dsd_rate_44x, format_width)
from gstreamer_tpu.audio.iec61937 import frame_size, payload
from gstreamer_tpu.video.dma import (DRM_FORMAT_MOD_LINEAR,
                                     MOD_SAMSUNG_64_32_TILE,
                                     dma_drm_fourcc_from_format,
                                     dma_drm_fourcc_from_string,
                                     dma_drm_fourcc_to_format,
                                     dma_drm_fourcc_to_string, fourcc)


class TestDrmFourcc:
    def test_linear_mappings(self):
        code, mod = dma_drm_fourcc_from_format("NV12")
        assert code == fourcc("NV12") and mod == DRM_FORMAT_MOD_LINEAR
        assert dma_drm_fourcc_to_format(code, mod) == "NV12"
        # RGB swaps: GStreamer RGB = DRM BGR888 (drm names are
        # little-endian packed)
        assert dma_drm_fourcc_from_format("RGB")[0] == fourcc("BG24")
        assert dma_drm_fourcc_from_format("BGRA")[0] == fourcc("AR24")

    def test_tiled_modifiers(self):
        code, mod = dma_drm_fourcc_from_format("NV12_64Z32")
        assert code == fourcc("NV12") and mod == MOD_SAMSUNG_64_32_TILE
        assert dma_drm_fourcc_to_format(code, mod) == "NV12_64Z32"
        assert dma_drm_fourcc_to_format(code) == "NV12"

    def test_string_roundtrip(self):
        code, mod = dma_drm_fourcc_from_format("NV12_64Z32")
        s = dma_drm_fourcc_to_string(code, mod)
        assert s.startswith("NV12:0x")
        code2, mod2 = dma_drm_fourcc_from_string(s)
        assert (code2, mod2) == (code, mod)
        assert dma_drm_fourcc_from_string("YU12") == (
            fourcc("YU12"), DRM_FORMAT_MOD_LINEAR)

    def test_every_format_roundtrips(self):
        from gstreamer_tpu.video.dma import _FORMAT_MAP
        for fmt, (code, mod) in _FORMAT_MAP.items():
            back = dma_drm_fourcc_to_format(code, mod)
            # NV12 fourcc maps to several tiled layouts; the reverse map
            # keeps the first (linear) entry
            if back != fmt:
                assert dma_drm_fourcc_from_format(back) == (code, mod)


def _gold_dsd_i2i(data, in_fmt, out_fmt, channels, reverse):
    """Scalar transliteration of
    gst_dsd_convert_interleaved_to_interleaved (gstdsd.c:738)."""
    from gstreamer_tpu.audio.dsd import _IS_LE, _WIDTH
    n = len(data)
    iw, ow = _WIDTH[in_fmt], _WIDTH[out_fmt]
    out = np.zeros(n, np.uint8)
    out_stride = ow * channels
    for out_index in range(n):
        owi = out_index // ow
        owo = out_index % ow
        if _IS_LE[out_fmt]:
            owo = ow - 1 - owo
        ch = owi % channels
        pos = (out_index // out_stride) * ow + owo
        iwi = (pos // iw) * channels + ch
        iwo = pos % iw
        if _IS_LE[in_fmt]:
            iwo = iw - 1 - iwo
        in_index = iwi * iw + iwo
        b = data[in_index]
        out[out_index] = BIT_REVERSE[b] if reverse else b
    return out


class TestDsd:
    def test_u16be_to_u32be_example(self):
        # gstdsd.c code path (:738): U16BE -> U32BE stereo, out byte 15:
        # owi=3, owo=3, ch=1, pos=(15//8)*4+3=7, iwi=(7//2)*2+1=7,
        # in_index=15.  (The comment block at :713 walks the same example
        # to 23 but divides by out_stride where the code divides by
        # out_word_width — the code is authoritative.)
        data = np.arange(64, dtype=np.uint8)
        out = dsd_convert(data, "U16BE", "U32BE", 2)
        assert out[15] == data[15]
        # channel interleave: out word 0 (bytes 0-3) is channel 0's
        # first 4 time positions, i.e. input words 0 and 2
        np.testing.assert_array_equal(out[0:4], data[[0, 1, 4, 5]])

    @pytest.mark.parametrize("in_fmt,out_fmt", [
        ("U8", "U16LE"), ("U16BE", "U32BE"), ("U16LE", "U16BE"),
        ("U32LE", "U8"), ("U32BE", "U16LE")])
    @pytest.mark.parametrize("reverse", [False, True])
    def test_matches_scalar_gold(self, in_fmt, out_fmt, reverse):
        rng = np.random.default_rng(3)
        channels = 2
        n = 64
        data = rng.integers(0, 256, n).astype(np.uint8)
        got = dsd_convert(data, in_fmt, out_fmt, channels,
                          reverse_byte_bits=reverse)
        gold = _gold_dsd_i2i(data, in_fmt, out_fmt, channels, reverse)
        np.testing.assert_array_equal(got, gold)

    def test_roundtrip(self):
        rng = np.random.default_rng(4)
        data = rng.integers(0, 256, 128).astype(np.uint8)
        there = dsd_convert(data, "U8", "U32LE", 2)
        back = dsd_convert(there, "U32LE", "U8", 2)
        np.testing.assert_array_equal(back, data)

    def test_planar_roundtrip(self):
        rng = np.random.default_rng(5)
        data = rng.integers(0, 256, 64).astype(np.uint8)
        planar = dsd_convert(data, "U16LE", "U16LE", 2,
                             in_layout="interleaved",
                             out_layout="non-interleaved")
        back = dsd_convert(planar, "U16LE", "U16LE", 2,
                           in_layout="non-interleaved",
                           out_layout="interleaved")
        np.testing.assert_array_equal(back, data)

    def test_info_caps(self):
        info = DsdInfo(format="U32LE", channels=2)
        s = info.to_caps_structure()
        assert s.name == "audio/x-dsd"
        assert DsdInfo.from_caps_structure(s) == info
        assert format_width("U32LE") == 4
        assert dsd_rate_44x(2) == 44100 * 2 * 8


class TestIec61937:
    def test_frame_sizes(self):
        assert frame_size("ac3") == 6144
        assert frame_size("eac3") == 24576
        assert frame_size("mpeg", {"mpegaudioversion": 1, "layer": 3,
                                   "rate": 44100}) == 4608
        assert frame_size("mpeg", {"mpegaudioversion": 3, "layer": 3}) == 0
        assert frame_size("dts", {"frame-size": 2012,
                                  "block-size": 512}) == 2048

    def test_ac3_burst(self):
        frame = bytes([0x0B, 0x77, 0, 0, 0, 0x02]) + bytes(1530)
        out = payload(frame, "ac3")
        assert len(out) == 6144
        # little-endian 16-bit framing: Pa Pb bytes swapped
        assert out[0] == 0x72 and out[1] == 0xF8
        assert out[2] == 0x1F and out[3] == 0x4E
        # Pc low byte (data type 1) lands at offset 4 after the swap
        assert out[4] == 1 and out[5] == 0x02 & 0x7
        # Pd = frame size in bits, swapped
        bits = len(frame) * 8
        assert out[6] == (bits & 0xFF) and out[7] == (bits >> 8)
        # payload is byte-swapped pairs
        assert out[8] == frame[1] and out[9] == frame[0]
        # tail zero-padded
        assert not any(out[8 + len(frame):])

    def test_big_endian_out(self):
        frame = bytes([0x0B, 0x77, 0, 0, 0, 0]) + bytes(100)
        out = payload(frame, "ac3", big_endian_out=True)
        assert out[:4] == b"\xF8\x72\x4E\x1F"
        assert out[8:8 + len(frame)] == frame

    def test_too_large_rejected(self):
        assert payload(bytes(7000), "ac3") is None
