"""Per-format parity vs the REAL libgstvideo (1.22 oracle): for each
newly added format, run FORMAT -> unpack-target through the reference
gst_video_converter_frame and our VideoConverter and assert byte-exact
output.  Exercises the actual unpack semantics (bit replication rules,
byte/bit order, tiling) against the reference binary, not just internal
roundtrip consistency.

Formats the installed 1.22 doesn't know are skipped (they remain covered
by the roundtrip tests).
"""

import ctypes

import numpy as np
import pytest

import gst_ref
from gstreamer_tpu.video.converter import VideoConverter
from gstreamer_tpu.video.format import format_info, frame_size, to_bytes
from gstreamer_tpu.video.info import VideoInfo

pytestmark = pytest.mark.skipif(
    not gst_ref.available(), reason="system libgstvideo not available")

RNG = np.random.default_rng(7)


def _ref_knows(name: str) -> bool:
    libs = gst_ref._load()
    video = libs["video"]
    video.gst_video_format_from_string.restype = ctypes.c_int
    video.gst_video_format_from_string.argtypes = [ctypes.c_char_p]
    return video.gst_video_format_from_string(name.encode()) != 0


def random_planes(fmt, w, h):
    from gstreamer_tpu.video.format import plane_shapes
    out = []
    for c, s in enumerate(plane_shapes(fmt, w, h)):
        d = fmt.depth[c] if c < len(fmt.depth) else fmt.depth[0]
        if fmt.bits == 16:
            v = RNG.integers(0, 1 << d, size=s).astype(np.uint16)
            if fmt.justify == "high":
                v = (v << (16 - d)).astype(np.uint16)
        else:
            v = RNG.integers(0, 1 << min(d, 8), size=s).astype(np.uint8)
        out.append(v)
    return tuple(out)


def _run_case(in_fmt, out_fmt, w, h):
    if not (_ref_knows(in_fmt) and _ref_knows(out_fmt)):
        pytest.skip(f"oracle 1.22 lacks {in_fmt} or {out_fmt}")
    ii = VideoInfo(format=in_fmt, width=w, height=h)
    oi = VideoInfo(format=out_fmt, width=w, height=h)
    planes = random_planes(ii.finfo, w, h)
    tight = to_bytes(ii.finfo, planes, w, h).reshape(-1)
    assert tight.size == frame_size(ii.finfo, w, h)
    # dither pinned OFF on both sides: deep-depth outputs otherwise
    # diverge on the 1.22-vs-1.29 dither-at-quantization-0 behavior
    cfg = (gst_ref.GENERIC_CONFIG
           + ", dither-method=(GstVideoDitherMethod)none")
    ref = gst_ref.convert_frame(
        f"video/x-raw,format={in_fmt},width={w},height={h}",
        f"video/x-raw,format={out_fmt},width={w},height={h}",
        tight, config=cfg)
    mine = VideoConverter(ii, oi,
                          {"dither-method": "none"}).convert_ref(planes)
    mine_tight = to_bytes(oi.finfo, mine, w, h).reshape(-1)
    np.testing.assert_array_equal(ref, mine_tight)


# 4:4:4 / full-res formats -> their unpack target (no chroma resample:
# pure unpack + matrix-free repack path)
UNPACK_CASES = [
    ("v308", "AYUV"), ("IYU2", "AYUV"), ("RBGA", "RGBA"),
    ("RGB16", "ARGB"), ("BGR16", "ARGB"), ("RGB15", "ARGB"),
    ("BGR15", "ARGB"),
    ("RGB10A2_LE", "ARGB64"), ("BGR10A2_LE", "ARGB64"),
    ("r210", "ARGB64"), ("Y410", "AYUV64"),
    ("Y444_10BE", "AYUV64"), ("Y444_12LE", "AYUV64"),
    ("Y444_16BE", "AYUV64"), ("GBR", "RGB"), ("GBRA", "RGBA"),
    ("GBR_10LE", "ARGB64"), ("GBR_12BE", "ARGB64"),
    ("GBRA_10LE", "ARGB64"), ("A444", "AYUV"),
    ("A444_10LE", "AYUV64"), ("A444_12BE", "AYUV64"),
    ("RGBP", "RGB"), ("BGRP", "RGB"),
    # gray -> gray (no colorimetry defaults involved; 1.22's default
    # gray colorimetry differs from 1.29's)
    ("GRAY10_LE16", "GRAY16_LE"), ("GRAY16_BE", "GRAY16_LE"),
    ("Y416_LE", "AYUV64"), ("Y412_BE", "AYUV64"),
]


@pytest.mark.parametrize("case", UNPACK_CASES,
                         ids=[f"{a}to{b}" for a, b in UNPACK_CASES])
def test_unpack_parity(case):
    _run_case(case[0], case[1], 32, 16)


# subsampled formats: layout-only conversions (no resample ambiguity).
# Deep-depth cases target 16-bit-deep outputs: the 1.22 oracle ROUNDS at
# 10/12-bit pack truncation where 1.29 (and we) truncate, so targets
# that keep all 16 bits isolate the unpack under test.
LAYOUT_CASES = [
    ("YVU9", "YUV9"),
    ("IYU1", "Y41B"),
    ("NV61", "NV16"), ("A422", "Y42B"),
    ("P016_LE", "Y444_16LE"), ("P016_BE", "P016_LE"),
    ("I420_10BE", "P016_LE"), ("I422_12BE", "v216"),
    ("A420_10LE", "A420"), ("v216", "Y444_16LE"), ("Y216_LE", "v216"),
    # (Y210/Y212 excluded: the 1.22 oracle replicates low bits only for
    # the first luma of each pair — fixed by 1.29, whose semantics we
    # implement: unpack_Y210 video-format.c:759 replicates Y0 AND Y1)
    # tiled: detile == layout change only
    ("NV12_4L4", "NV12"), ("NV12_32L32", "NV12"),
    ("NV12_16L32S", "NV12"), ("NV12_8L128", "NV12"),
    ("AV12", "A420"),
    # 10-bit packed/word/tiled family (skipped where 1.22 lacks them)
    ("UYVP", "v216"),
    ("GRAY10_LE32", "GRAY16_LE"),
    ("NV12_10LE32", "P016_LE"), ("NV16_10LE32", "v216"),
    ("NV12_10LE40", "P016_LE"), ("NV16_10LE40", "v216"),
    ("NV12_10LE40_4L4", "P016_LE"),
    ("NV12_10BE_8L128", "P016_LE"),
    ("MT2110T", "P016_LE"), ("MT2110R", "P016_LE"),
    ("RGB10x2_LE", "ARGB64"), ("BGR10x2_LE", "ARGB64"),
]


@pytest.mark.parametrize("case", LAYOUT_CASES,
                         ids=[f"{a}to{b}" for a, b in LAYOUT_CASES])
def test_layout_parity(case):
    _run_case(case[0], case[1], 64, 64)


def test_zflipz_tiling_parity():
    # ZFLIPZ_2X2 zigzag needs >=4 tile columns to exercise the pattern
    _run_case("NV12_64Z32", "NV12", 256, 64)


def test_rgb8p_parity():
    """RGB8P: random indices + random palette through the oracle; our
    converter gets the palette-resolved planes (unpack_RGB8P
    video-format.c:2188)."""
    if not (_ref_knows("RGB8P") and _ref_knows("ARGB")):
        pytest.skip("oracle lacks RGB8P")
    from gstreamer_tpu.video.format import from_bytes
    w, h = 32, 16
    fmt = format_info("RGB8P")
    tight = RNG.integers(0, 256, size=frame_size(fmt, w, h)).astype(np.uint8)
    ii = VideoInfo(format="RGB8P", width=w, height=h)
    oi = VideoInfo(format="ARGB", width=w, height=h)
    cfg = (gst_ref.GENERIC_CONFIG
           + ", dither-method=(GstVideoDitherMethod)none")
    ref = gst_ref.convert_frame(
        f"video/x-raw,format=RGB8P,width={w},height={h}",
        f"video/x-raw,format=ARGB,width={w},height={h}",
        tight, config=cfg)
    planes = from_bytes(fmt, tight, w, h)
    mine = VideoConverter(ii, oi, {"dither-method": "none"}).convert_ref(
        planes)
    mine_tight = to_bytes(oi.finfo, mine, w, h).reshape(-1)
    np.testing.assert_array_equal(ref, mine_tight)
