"""Property-based converter fuzzing.

Models the reference's oss-fuzz target ci/fuzzing/gst-video-converter.c:
random (format, size, config) pairs must (a) not crash, (b) produce the
same bytes on the jitted device path as the numpy gold path, (c) produce
output planes of the negotiated geometry.
"""

import numpy as np
import pytest

from gstreamer_tpu.video.converter import VideoConverter
from gstreamer_tpu.video.format import FORMATS, format_info, plane_shapes
from gstreamer_tpu.video.info import VideoInfo

FUZZ_FORMATS = ["I420", "YV12", "NV12", "YUY2", "UYVY", "AYUV", "Y444",
                "Y42B", "RGB", "BGR", "RGBA", "BGRx", "ARGB", "GRAY8",
                "I420_10LE", "AYUV64", "v210", "Y41B"]


def _rand_planes(rng, fmt_name, w, h, batch=1):
    fmt = format_info(fmt_name)
    planes = []
    for (ph, pw) in plane_shapes(fmt, w, h):
        if fmt.bits == 8:
            planes.append(rng.randint(0, 256, (batch, ph, pw),
                                      ).astype(np.uint8))
        else:
            depth = fmt.depth[0]
            v = rng.randint(0, 1 << depth, (batch, ph, pw))
            if fmt_name in ("P010_10LE",):
                v = v << (16 - depth)
            planes.append(v.astype(np.uint16))
    return tuple(planes)


@pytest.mark.parametrize("seed", range(24))
def test_random_config_convert(seed):
    rng = np.random.RandomState(seed)
    in_fmt = FUZZ_FORMATS[rng.randint(len(FUZZ_FORMATS))]
    out_fmt = FUZZ_FORMATS[rng.randint(len(FUZZ_FORMATS))]
    # even dims keep every format valid; sizes small for speed
    iw, ih = 2 * rng.randint(4, 33), 2 * rng.randint(4, 25)
    ow, oh = 2 * rng.randint(4, 33), 2 * rng.randint(4, 25)
    if in_fmt == "v210":
        iw = max(iw, 12)
    if out_fmt == "v210":
        ow = max(ow, 12)
    cfg = {}
    if rng.rand() < 0.3:
        cfg["resampler-method"] = ["linear", "cubic", "lanczos",
                                   "nearest"][rng.randint(4)]
    if rng.rand() < 0.2:
        cfg["dither-method"] = ["none", "bayer", "verterr"][rng.randint(3)]
    if rng.rand() < 0.2:
        cfg["gamma-mode"] = "remap"
    if rng.rand() < 0.2:
        cfg["dest-x"] = 2 * rng.randint(0, max(ow // 4, 1))
        cfg["dest-y"] = 2 * rng.randint(0, max(oh // 4, 1))
        cfg["dest-width"] = max(ow - cfg["dest-x"] - 2, 2)
        cfg["dest-height"] = max(oh - cfg["dest-y"] - 2, 2)

    ii = VideoInfo(format=in_fmt, width=iw, height=ih)
    oi = VideoInfo(format=out_fmt, width=ow, height=oh)
    vc = VideoConverter(ii, oi, cfg)
    planes = _rand_planes(rng, in_fmt, iw, ih)

    gold = vc.convert_ref(planes)
    dev = vc.convert(planes)
    out_shapes = plane_shapes(format_info(out_fmt), ow, oh)
    assert len(gold) == len(out_shapes) or format_info(out_fmt).layout \
        in ("packed", "v210", "semi")
    for g, d in zip(gold, dev):
        assert np.asarray(g).shape == np.asarray(d).shape
        assert np.array_equal(np.asarray(g), np.asarray(d)), (
            seed, in_fmt, out_fmt, cfg)
