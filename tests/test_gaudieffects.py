"""gaudieffects: scalar-gold parity per element."""

import math

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.gaudieffects import COS_TABLE


def _run(desc, fmt="RGBx", w=48, h=32):
    p = parse_launch(
        f"videotestsrc num-buffers=1 pattern=smpte75 ! "
        f"video/x-raw,format={fmt},width={w},height={h} ! "
        f"tee name=t t. ! queue ! appsink name=raw "
        f"t. ! queue ! {desc} ! appsink name=fx")
    p.run()
    raw = [np.asarray(x)[0].astype(np.int64) for x in
           p.get_by_name("raw").pull_sample().buffer.data]
    fx = [np.asarray(x)[0].astype(np.int64) for x in
          p.get_by_name("fx").pull_sample().buffer.data]
    return raw, fx


def _clamp(v):
    return max(0, min(255, v))


class TestScalarGolds:
    def test_dodge(self):
        raw, fx = _run("dodge")
        for c in range(3):
            gold = np.vectorize(
                lambda v: _clamp((256 * int(v)) // (256 - int(v))))(
                    raw[c])
            np.testing.assert_array_equal(fx[c], gold)

    def test_burn(self):
        raw, fx = _run("burn adjustment=175")
        def burn1(v):
            v = int(v)
            a = ((v + 175) & 0xFFFF) >> 1
            t = (255 - v) << 7
            q = 0xFFFF if a == 0 else t // a
            return (255 - q) & 0xFF
        for c in range(3):
            np.testing.assert_array_equal(
                fx[c], np.vectorize(burn1)(raw[c]))

    def test_chromium(self):
        raw, fx = _run("chromium edge-a=200 edge-b=1")
        def ch1(v):
            v = int(v)
            angle = (v + 200 + (v * 1) // 2) & 1023
            return _clamp(abs(int(COS_TABLE[angle])))
        for c in range(3):
            np.testing.assert_array_equal(
                fx[c], np.vectorize(ch1)(raw[c]))

    def test_exclusion_uses_green_cross_term(self):
        raw, fx = _run("exclusion factor=175")
        r, g, b = raw[:3]
        f = 175
        gr = f - (((f - r) * (f - r)) // f + (g * r) // f)
        gg = f - (((f - g) * (f - g)) // f + (g * g) // f)
        gb = f - (((f - b) * (f - b)) // f + (b * b) // f)
        np.testing.assert_array_equal(fx[0], np.clip(gr, 0, 255))
        np.testing.assert_array_equal(fx[1], np.clip(gg, 0, 255))
        np.testing.assert_array_equal(fx[2], np.clip(gb, 0, 255))

    def test_solarize(self):
        raw, fx = _run("solarize")
        thr, start, end = 127, 50, 185
        period, up_len, down_len = end - start, thr - start, end - thr
        def sol1(v):
            param = (int(v) + 256 - start) % period
            if param < up_len:
                c = (param * 255) // up_len
            else:
                c = ((down_len - (param - up_len)) * 255) // down_len
            return min(c & 0xFFFFFFFF, 255)
        for c in range(3):
            np.testing.assert_array_equal(
                fx[c], np.vectorize(sol1)(raw[c]))

    def test_dilate_gold(self):
        raw, fx = _run("dilate", w=24, h=16)
        r, g, b = raw[:3]
        h_, w_ = r.shape
        lum = 90 * r + 115 * g + 51 * b
        out = np.stack([r, g, b], -1).copy()
        for i in range(h_):
            for j in range(w_):
                cur_l = lum[i, j]
                cur = out[i, j].copy()
                # down, right, (up = self: reference bug), left
                for di, dj, valid in ((1, 0, i + 1 < h_),
                                      (0, 1, j + 1 < w_),
                                      (0, -1, j - 1 >= 0)):
                    ni, nj = (i + di, j + dj) if valid else (i, j)
                    nl = lum[ni, nj]
                    if nl > cur_l:
                        cur = np.array([r[ni, nj], g[ni, nj],
                                        b[ni, nj]])
                        cur_l = nl
                out[i, j] = cur
        np.testing.assert_array_equal(fx[0], out[..., 0])
        np.testing.assert_array_equal(fx[1], out[..., 1])
        np.testing.assert_array_equal(fx[2], out[..., 2])

    def test_gaussianblur_close_to_gold(self):
        raw, fx = _run("gaussianblur sigma=1.2", fmt="AYUV")
        # separable float gold (summation order may differ by 1 LSB)
        sigma = np.float32(1.2)
        center = int(math.ceil(2.5 * abs(float(sigma))))
        win = 1 + 2 * center
        fe = np.float32(-0.5) / (sigma * sigma)
        dx = np.float32(1.0) / (sigma * np.float32(math.sqrt(
            2 * math.pi)))
        k = np.empty(win, np.float32)
        k[center] = dx
        for i in range(1, center + 1):
            k[center + i] = k[center - i] = dx * np.float32(
                math.e) ** (fe * i * i)
        for c in range(4):
            x = raw[c].astype(np.float32)
            h_, w_ = x.shape
            tmp = np.zeros_like(x)
            for col in range(w_):
                kmin = max(0, center - col)
                kmax = min(win, w_ - (col - center))
                s = k[kmin:kmax].sum()
                acc = sum(k[kk] * x[:, col - center + kk]
                          for kk in range(kmin, kmax))
                tmp[:, col] = acc / s
            out = np.zeros_like(x)
            for row in range(h_):
                kmin = max(0, center - row)
                kmax = min(win, h_ - (row - center))
                s = k[kmin:kmax].sum()
                acc = sum(k[kk] * tmp[row - center + kk, :]
                          for kk in range(kmin, kmax))
                out[row] = np.clip(acc / s + 0.5, 0, 255)
            gold = out.astype(np.uint8)
            diff = np.abs(fx[c].astype(int) - gold.astype(int))
            assert diff.max() <= 1
