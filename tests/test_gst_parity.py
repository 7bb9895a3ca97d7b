"""Bit-parity tests against the REAL GStreamer (system libgstvideo 1.22)
driven via ctypes (tests/gst_ref.py).

Scope note: the system oracle is 1.22; the build reference is 1.29.  The
converter core was rewritten between those versions (videoconvertscale,
1.24), so scaled conversions and some 4:2:0-input paths differ between
1.22 and 1.29 — and 1.22 silently takes fastpaths we cannot always disable
from the public config surface.  The cases below are the ones where the
1.22 generic path is known to equal the 1.29 semantics we implement; each
asserts BYTE-EXACT equality on random frames.  Everything else is covered
by the numpy-gold parity tests in test_video_convert.py (the gold encodes
the 1.29 sources line-by-line).
"""

import numpy as np
import pytest

import gst_ref
from gstreamer_tpu.video.converter import VideoConverter
from gstreamer_tpu.video.format import to_bytes
from gstreamer_tpu.video.info import VideoInfo

pytestmark = pytest.mark.skipif(
    not gst_ref.available(), reason="system libgstvideo not available")

RNG = np.random.default_rng(123)

# conversions whose 1.22 generic path == 1.29 semantics (verified EXACT)
EXACT_CASES = [
    ("RGB", (64, 48), "I420", (64, 48)),     # matrix8_table + chroma down
    ("RGB", (64, 48), "NV12", (64, 48)),
    ("BGRA", (32, 32), "NV12", (32, 32)),
    ("YUY2", (64, 48), "RGBx", (64, 48)),    # h2 chroma up + AYUV->ARGB matrix
    ("UYVY", (64, 48), "BGRx", (64, 48)),
    ("NV12", (64, 48), "I420", (64, 48)),    # layout change only
    ("GRAY8", (32, 32), "RGB", (32, 32)),
    ("Y444", (32, 32), "I420", (32, 32)),    # chroma downsample both axes
    ("Y444", (32, 32), "RGB", (32, 32)),     # pure matrix
    ("AYUV", (32, 32), "ARGB", (32, 32)),
    ("RGB", (32, 32), "BGR", (32, 32)),      # pure repack
    ("RGBA", (32, 32), "AYUV", (32, 32)),
]


@pytest.mark.parametrize(
    "case", EXACT_CASES,
    ids=[f"{c[0]}to{c[2]}" for c in EXACT_CASES])
def test_byte_exact_vs_real_gstreamer(case):
    in_fmt, (iw, ih), out_fmt, (ow, oh) = case
    ii = VideoInfo(format=in_fmt, width=iw, height=ih)
    oi = VideoInfo(format=out_fmt, width=ow, height=oh)
    planes = tuple(RNG.integers(0, 256, s, dtype=np.uint8)
                   for s in ii.plane_shapes())
    tight = to_bytes(ii.finfo, planes, iw, ih).reshape(-1)
    ref = gst_ref.convert_frame(
        f"video/x-raw,format={in_fmt},width={iw},height={ih}",
        f"video/x-raw,format={out_fmt},width={ow},height={oh}",
        tight, config=gst_ref.GENERIC_CONFIG)
    mine = VideoConverter(ii, oi).convert_ref(planes)
    mine_tight = to_bytes(oi.finfo, mine, ow, oh).reshape(-1)
    np.testing.assert_array_equal(ref, mine_tight)


def test_i420_vertical_chroma_up_matches():
    """Directed: vertical 4:2:0 chroma upsample (3a+b)/4 filter — verified
    against 1.22 generic path (column probe)."""
    w = h = 8
    y = np.full((h, w), 100, np.uint8)
    u = np.array([[10], [50], [90], [130]], np.uint8) @ np.ones((1, 4), np.uint8)
    v = np.full((4, 4), 200, np.uint8)
    ii = VideoInfo(format="I420", width=w, height=h)
    oi = VideoInfo(format="Y444", width=w, height=h)
    mine = VideoConverter(ii, oi).convert_ref((y, u, v))
    np.testing.assert_array_equal(
        mine[1][:, 0], [10, 20, 40, 60, 80, 100, 120, 130])


def test_i420_to_rgb_reference_levels():
    """White/black levels of the real converter (fast AYUV->ARGB path):
    white(Y=235) -> 253 (the reference's 128-centered fixed point), black
    (Y=16) -> 0.  Verified against the system GStreamer."""
    w = h = 4
    u = np.full((2, 2), 128, np.uint8)
    v = np.full((2, 2), 128, np.uint8)
    ii = VideoInfo(format="I420", width=w, height=h)
    oi = VideoInfo(format="RGB", width=w, height=h)
    conv = VideoConverter(ii, oi)
    for yval, expect in ((235, 253), (16, 0), (126, 126)):
        y = np.full((h, w), yval, np.uint8)
        out = conv.convert_ref((y, u, v))
        ref = gst_ref.convert_frame(
            "video/x-raw,format=I420,width=4,height=4",
            "video/x-raw,format=RGB,width=4,height=4",
            np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
        assert out[0][0, 0] == expect
        assert ref[0] == expect


@pytest.mark.skipif(not gst_ref.available(), reason="no libgstvideo")
class TestV210Parity:
    """v210 conversions verified byte-exact against real libgstvideo."""

    # (v210->I420 takes the convert_v210_I420 fastpath in 1.22 with
    #  different chroma handling -- not oracle-comparable)
    @pytest.mark.parametrize("outf", ["AYUV64", "Y42B", "v210"])
    def test_v210_to(self, outf):
        from gstreamer_tpu.video.converter import VideoConverter
        from gstreamer_tpu.video.format import (format_info, from_bytes,
                                                to_bytes)
        from gstreamer_tpu.video.info import VideoInfo
        W, H = 48, 8
        rng = np.random.RandomState(2)
        y = rng.randint(0, 1024, (H, W)).astype(np.uint16)
        u = rng.randint(0, 1024, (H, W // 2)).astype(np.uint16)
        v = rng.randint(0, 1024, (H, W // 2)).astype(np.uint16)
        tight = to_bytes(format_info("v210"), [y, u, v], W, H)
        ref_b = gst_ref.convert_frame(
            f"video/x-raw,format=v210,width={W},height={H}",
            f"video/x-raw,format={outf},width={W},height={H}",
            tight, config=gst_ref.GENERIC_CONFIG)
        ref = from_bytes(format_info(outf), np.asarray(ref_b), W, H)
        vc = VideoConverter(VideoInfo(format="v210", width=W, height=H),
                            VideoInfo(format=outf, width=W, height=H))
        ours = vc.convert_ref(tuple(p[None] for p in (y, u, v)))
        for o, r in zip(ours, ref):
            assert np.array_equal(np.asarray(o)[0], np.asarray(r)), outf

    def test_i420_to_v210_device_matches_gold(self):
        # (I420->v210 fastpaths in 1.22 with different chroma handling --
        #  pin jit == numpy gold instead)
        from gstreamer_tpu.video.converter import VideoConverter
        from gstreamer_tpu.video.info import VideoInfo
        W, H = 48, 8
        rng = np.random.RandomState(3)
        planes = (rng.randint(0, 256, (1, H, W)).astype(np.uint8),
                  rng.randint(0, 256, (1, H // 2, W // 2)).astype(np.uint8),
                  rng.randint(0, 256, (1, H // 2, W // 2)).astype(np.uint8))
        vc = VideoConverter(VideoInfo(format="I420", width=W, height=H),
                            VideoInfo(format="v210", width=W, height=H))
        gold = vc.convert_ref(planes)
        dev = vc.convert(planes)
        for g, d in zip(gold, dev):
            assert np.array_equal(np.asarray(g), np.asarray(d))
