"""coloreffects scalar-gold parity + chromahold behavior."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.coloreffects import (TABLES, _RGB2YUV,
                                                 _YUV2RGB)


def gold_coloreffects(y, u, v, preset):
    """Direct transliteration of gst_color_effects_transform_ayuv."""
    table, map_luma = TABLES[preset]
    h, w = y.shape
    yo = np.empty_like(y)
    uo = np.empty_like(u)
    vo = np.empty_like(v)
    for i in range(h):
        for j in range(w):
            yy, uu, vv = int(y[i, j]), int(u[i, j]), int(v[i, j])
            if map_luma:
                r, g, b = (int(table[yy, 0]), int(table[yy, 1]),
                           int(table[yy, 2]))
            else:
                r = (298 * yy + 0 * uu + 409 * vv - 57068) >> 8
                g = (298 * yy - 100 * uu - 208 * vv + 34707) >> 8
                b = (298 * yy + 516 * uu + 0 * vv - 70870) >> 8
                r = max(0, min(255, r))
                g = max(0, min(255, g))
                b = max(0, min(255, b))
                r, g, b = (int(table[r, 0]), int(table[g, 1]),
                           int(table[b, 2]))
            yo[i, j] = max(0, min(255,
                                  (66 * r + 129 * g + 25 * b
                                   + 4096) >> 8))
            uo[i, j] = max(0, min(255,
                                  (-38 * r - 74 * g + 112 * b
                                   + 32768) >> 8))
            vo[i, j] = max(0, min(255,
                                  (112 * r - 94 * g - 18 * b
                                   + 32768) >> 8))
    return yo, uo, vo


@pytest.mark.parametrize("preset", ["heat", "sepia", "xray", "xpro",
                                    "yellowblue"])
def test_preset_matches_gold(preset):
    p = parse_launch(
        f"videotestsrc num-buffers=1 pattern=smpte75 ! "
        f"video/x-raw,format=AYUV,width=48,height=32 ! "
        f"tee name=t t. ! queue ! appsink name=raw "
        f"t. ! queue ! coloreffects preset={preset} ! "
        f"appsink name=fx")
    p.run()
    raw = [np.asarray(x)[0] for x in
           p.get_by_name("raw").pull_sample().buffer.data]
    fx = [np.asarray(x)[0] for x in
          p.get_by_name("fx").pull_sample().buffer.data]
    y, u, v, a = raw
    gy, gu, gv = gold_coloreffects(y, u, v, preset)
    np.testing.assert_array_equal(fx[0], gy)
    np.testing.assert_array_equal(fx[1], gu)
    np.testing.assert_array_equal(fx[2], gv)
    np.testing.assert_array_equal(fx[3], a)


def test_none_passthrough():
    p = parse_launch(
        "videotestsrc num-buffers=1 ! "
        "video/x-raw,format=AYUV,width=32,height=24 ! "
        "coloreffects ! appsink name=out")
    p.run()
    g = parse_launch(
        "videotestsrc num-buffers=1 ! "
        "video/x-raw,format=AYUV,width=32,height=24 ! "
        "appsink name=out")
    g.run()
    a = p.get_by_name("out").pull_sample().buffer.data
    b = g.get_by_name("out").pull_sample().buffer.data
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestChromaHold:
    def test_holds_red_desaturates_blue(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=red ! "
            "video/x-raw,format=AYUV,width=16,height=16 ! "
            "chromahold ! appsink name=out")
        p.run()
        y, u, v, a = [np.asarray(x)[0] for x in
                      p.get_by_name("out").pull_sample().buffer.data]
        # red chroma kept (not neutral)
        assert not ((u == 128).all() and (v == 128).all())

        p2 = parse_launch(
            "videotestsrc num-buffers=1 pattern=blue ! "
            "video/x-raw,format=AYUV,width=16,height=16 ! "
            "chromahold ! appsink name=out")
        p2.run()
        y2, u2, v2, a2 = [
            np.asarray(x)[0] for x in
            p2.get_by_name("out").pull_sample().buffer.data]
        assert (u2 == 128).all() and (v2 == 128).all()
