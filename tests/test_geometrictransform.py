"""geometrictransform family: scalar-gold parity + smoke for all."""

import math

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch

ALL = ["bulge", "circle", "fisheye", "kaleidoscope", "mirror",
       "perspective", "pinch", "rotate", "sphere", "square",
       "stretch", "tunnel", "twirl", "waterripple"]


def _run(desc, fmt="AYUV", w=40, h=30):
    p = parse_launch(
        f"videotestsrc num-buffers=1 pattern=smpte75 ! "
        f"video/x-raw,format={fmt},width={w},height={h} ! "
        f"tee name=t t. ! queue ! appsink name=raw "
        f"t. ! queue ! {desc} ! appsink name=fx")
    p.run()
    raw = [np.asarray(x)[0] for x in
           p.get_by_name("raw").pull_sample().buffer.data]
    fx = [np.asarray(x)[0] for x in
          p.get_by_name("fx").pull_sample().buffer.data]
    return raw, fx


def _gold_warp(raw, map_fn, w, h, mode="ignore"):
    """C transliteration of do_map (nearest, trunc toward zero)."""
    out = [np.full((h, w), v, raw[0].dtype)
           for v in (16, 128, 128, 255)]
    for y in range(h):
        for x in range(w):
            in_x, in_y = map_fn(x, y)
            if mode == "clamp":
                in_x = min(max(in_x, 0), w - 1)
                in_y = min(max(in_y, 0), h - 1)
            tx, ty = int(in_x), int(in_y)
            if 0 <= tx < w and 0 <= ty < h:
                for c in range(4):
                    out[c][y, x] = raw[c][ty, tx]
    return out


class TestGolds:
    def test_rotate_gold(self):
        w, h = 40, 30
        ar = 0.7
        raw, fx = _run(f"rotate angle={ar}", w=w, h=h)

        def m(x, y):
            cox, coy = 0.5 * w, 0.5 * h
            xo, yo = x - cox, y - coy
            ao = math.atan2(yo, xo) + ar
            r = math.sqrt(xo * xo + yo * yo)
            return r * math.cos(ao) + cox, r * math.sin(ao) + coy

        gold = _gold_warp(raw, m, w, h)
        for c in range(4):
            np.testing.assert_array_equal(fx[c], gold[c])

    def test_twirl_gold(self):
        w, h = 40, 30
        raw, fx = _run("twirl", w=w, h=h)
        pcx, pcy = 0.5 * w, 0.5 * h
        pr = 0.35 * 0.5 * math.sqrt(w * w + h * h)
        pr2 = pr * pr

        def m(x, y):
            dx, dy = x - pcx, y - pcy
            distance = dx * dx + dy * dy
            if distance > pr2:
                return x, y
            d = math.sqrt(distance)
            a = math.atan2(dy, dx) + math.pi * (pr - d) / pr
            return pcx + d * math.cos(a), pcy + d * math.sin(a)

        gold = _gold_warp(raw, m, w, h)
        for c in range(4):
            np.testing.assert_array_equal(fx[c], gold[c])

    def test_mirror_left(self):
        raw, fx = _run("mirror mode=left", w=40, h=30)
        # right half mirrors the left half
        np.testing.assert_array_equal(fx[0][:, 39], raw[0][:, 0])
        np.testing.assert_array_equal(fx[0][:, :20], raw[0][:, :20])

    def test_perspective_identity(self):
        raw, fx = _run("perspective")
        for c in range(4):
            np.testing.assert_array_equal(fx[c], raw[c])


class TestSmoke:
    @pytest.mark.parametrize("name", ALL)
    def test_runs_and_differs(self, name):
        raw, fx = _run(name)
        assert fx[0].shape == raw[0].shape
        if name not in ("perspective",):   # identity default
            diff = sum(int((np.asarray(a) != np.asarray(b)).sum())
                       for a, b in zip(raw, fx))
            assert diff > 0

    def test_clamp_mode(self):
        raw, fx = _run("rotate angle=0.5 off-edge-pixels=clamp")
        # clamp never leaves black holes: every output pixel comes
        # from the source (A stays 255 everywhere)
        assert (fx[3] == 255).all()


class TestNoiseMembers:
    def test_marble_deterministic_per_seed(self):
        a1, f1 = _run("marble seed=7")
        a2, f2 = _run("marble seed=7")
        for x, y in zip(f1, f2):
            np.testing.assert_array_equal(x, y)
        _, f3 = _run("marble seed=8")
        assert any(not np.array_equal(x, y)
                   for x, y in zip(f1, f3))

    def test_diffuse_scale_bounds_displacement(self):
        # scale=0: identity (zero displacement tables)
        raw, fx = _run("diffuse scale=0")
        for c in range(4):
            np.testing.assert_array_equal(fx[c], raw[c])
