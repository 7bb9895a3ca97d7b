"""monoscope: scalar-gold parity for one update + element rendering."""

import numpy as np

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.monoscope import (BIG, HEIGHT, SMALL, WIDTH,
                                              Monoscope, _colors,
                                              convolve_match)


def gold_update(avg_eq, avg_max, window):
    """Scalar transliteration of monoscope_update (monoscope.c:89)."""
    colors = _colors()
    # direct convolve_match
    mean = sum(float(v) for v in avg_eq) / SMALL
    best, p = None, 0
    for k in range(SMALL + 1):
        c = sum(float(window[k + j]) * (float(avg_eq[j]) - mean)
                for j in range(SMALL))
        if best is None or c > best:
            best, p = c, k
    this_eq = window[p:p + SMALL]
    display = np.zeros(WIDTH * HEIGHT, np.uint32)
    new_avg = np.zeros(SMALL, np.int64)
    mx = 1
    for i in range(SMALL):
        a = (int(this_eq[i]) + int(avg_eq[i])) >> 1
        new_avg[i] = a
        mx = max(mx, abs(a))
    avg_max = avg_max + mx // 4 - avg_max // 4
    hh = HEIGHT // 2
    hh1 = hh - 1
    factor = hh / avg_max if avg_max else 1.0
    for i in range(WIDTH):
        foo = int(new_avg[i] * factor)
        foo = max(-hh1, min(hh1, foo))
        bar = i + (foo + hh) * WIDTH
        if 0 < bar < WIDTH * HEIGHT:
            if foo < 0:
                for h in range(-foo + 1):
                    display[bar + h * WIDTH] = colors[h]
            else:
                for h in range(foo + 1):
                    display[bar - h * WIDTH] = colors[h]
    gray = colors[hh1]
    grid = display.reshape(HEIGHT, WIDTH)
    for i in range(16, HEIGHT, 16):
        grid[i, 0:WIDTH:2] = gray
        if i == hh:
            grid[i, 1:WIDTH:2] = gray
    for i in range(16, WIDTH, 16):
        grid[0:HEIGHT:2, i] = gray
    return new_avg, avg_max, display


class TestMonoscopeGold:
    def test_single_update_parity(self):
        rng = np.random.default_rng(7)
        window = (rng.standard_normal(BIG) * 8000).astype(np.int64)
        el = Monoscope()
        el._spf = 512
        el.setup()
        # seed a non-trivial running average
        el._avg_eq = (rng.standard_normal(SMALL) * 500).astype(np.int64)
        el._avg_max = 300
        want_avg, want_max, want_disp = gold_update(
            el._avg_eq.copy(), el._avg_max, window.copy())
        canvas = np.zeros(WIDTH * HEIGHT + WIDTH + 2, np.uint32)
        el.render(canvas, window[:, None].astype(np.int16))
        np.testing.assert_array_equal(el._avg_eq, want_avg)
        assert el._avg_max == want_max
        np.testing.assert_array_equal(canvas[:WIDTH * HEIGHT],
                                      want_disp)

    def test_convolve_match_tracks_shift(self):
        # a pattern shifted by k is matched at offset k
        rng = np.random.default_rng(1)
        base = (rng.standard_normal(SMALL) * 1000).astype(np.int64)
        for shift in (0, 10, 200):
            window = np.zeros(BIG, np.int64)
            window[shift:shift + SMALL] = base
            assert convolve_match(base, window) == shift


class TestMonoscopeElement:
    def test_pipeline_output(self):
        p = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=2048 "
            "wave=sine ! audio/x-raw,format=S16LE,rate=44100,"
            "channels=1 ! monoscope ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        caps = s.caps[0]
        assert (caps["width"], caps["height"]) == (256, 128)
        d = [np.asarray(x) for x in s.buffer.data]
        assert any((x > 0).any() for x in d)
