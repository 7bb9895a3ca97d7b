"""smooth and speed: scalar-gold parity."""

import math

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


def gold_smooth(src, tolerance, fs):
    """Direct transliteration of smooth_filter (gstsmooth.c:130)."""
    h, w = src.shape
    dest = np.zeros_like(src)
    fy1 = 0
    fy2 = min(fs + 1, h)
    for y in range(h):
        if y > fs + 1:
            fy1 += 1
        if y < h - (fs + 1):
            fy2 += 1
        for x in range(w):
            ref = int(src[y, x])
            upper = ref + tolerance
            lower = ref - tolerance
            num = 1
            s = ref
            for fy in range(fy1, fy2):
                for fx in range(max(x - fs, 0), min(x + fs + 1, w)):
                    akt = int(src[fy, fx])
                    if (lower - akt) * (upper - akt) < 0:
                        num += 1
                        s += akt
            dest[y, x] = s // num
    return dest


class TestSmooth:
    def test_matches_gold(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=smpte75 ! "
            "video/x-raw,format=I420,width=32,height=24 ! "
            "tee name=t t. ! queue ! appsink name=raw "
            "t. ! queue ! smooth ! appsink name=fx")
        p.run()
        raw = [np.asarray(x)[0] for x in
               p.get_by_name("raw").pull_sample().buffer.data]
        fx = [np.asarray(x)[0] for x in
              p.get_by_name("fx").pull_sample().buffer.data]
        gold = gold_smooth(raw[0].astype(np.int64), 8, 3)
        np.testing.assert_array_equal(fx[0], gold)
        # chroma untouched
        np.testing.assert_array_equal(fx[1], raw[1])
        np.testing.assert_array_equal(fx[2], raw[2])


def gold_speed(x, speed):
    """speed_chain_float32 transliteration (float32 math)."""
    n, ch = x.shape
    out = []
    for c in range(ch):
        col = x[:, c].astype(np.float32)
        lower = col[0]
        i_float = np.float32(0.5) * (np.float32(speed)
                                     - np.float32(1.0))
        i = math.ceil(float(i_float))
        vals = []
        while i < n:
            interp = np.float32(i_float - np.float32(
                math.floor(float(i_float))))
            vals.append(np.float32(
                lower * (np.float32(1) - interp) + col[i] * interp))
            lower = col[i]
            i_float = np.float32(i_float + np.float32(speed))
            i = math.ceil(float(i_float))
        out.append(vals)
    m = min(len(v) for v in out)
    return np.stack([np.array(v[:m], np.float32) for v in out], -1)


class TestSpeed:
    @pytest.mark.parametrize("speed", [0.5, 1.5, 2.0])
    def test_float_gold(self, speed):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((500, 2)).astype(np.float32)
        p = parse_launch(
            f"appsrc name=in ! audio/x-raw,format=F32LE,rate=8000,"
            f"channels=2 ! speed speed={speed} ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=x))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample().buffer.data)
        want = gold_speed(x, speed)
        np.testing.assert_array_equal(got, want)

    def test_length_scales(self):
        x = np.zeros((1000, 1), np.float32)
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=F32LE,rate=8000,"
            "channels=1 ! speed speed=2.0 ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=x))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample().buffer.data)
        assert abs(len(got) - 500) <= 1
