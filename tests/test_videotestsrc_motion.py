"""Animated videotestsrc patterns: ball (wavy/sweep/flip), blink,
horizontal-speed scroll, time-dependent zone plates.

The ball gold below is a direct scalar transliteration of
gst_video_test_src_ball (videotestsrc.c); the vectorized element path
must match it bit-for-bit."""

import math

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.videotestsrc import VideoTestSrc, _blend


def _gold_ball_coverage(w, h, n, motion="wavy", animation="frames",
                        fps=(10, 1)):
    """Scalar port: returns the t (coverage) plane plus (x, y)."""
    if animation == "running-time":
        t_s = n * fps[1] / fps[0]
        rad = t_s
    else:
        rad = n / 200.0
    radius = 20
    if motion == "hsweep":
        rad /= 2
        rad -= math.floor(2 * rad) / 2
    rad = 2 * math.pi * rad
    if motion == "wavy":
        x = radius + (0.5 + 0.5 * math.sin(rad)) * (w - 2 * radius)
        y = radius + (0.5 + 0.5 * math.sin(rad * math.sqrt(2))) \
            * (h - 2 * radius)
    else:
        radius = min(h, w) // 4
        x = w / 2 + math.sin(rad) * radius
        y = h / 2 - math.cos(rad) * radius
    t = np.zeros((h, w), np.int64)
    for i in range(h):
        if i < y - radius or i > y + radius:
            continue
        o = max(0.0, radius * radius - (i - y) * (i - y))
        r = round(math.sqrt(o))
        x1 = int(max(0.0, x - r))
        x2 = int(min(float(w), x + r + 1))
        for j in range(x1, x2):
            rr = radius - math.sqrt((j - x) ** 2 + (i - y) ** 2)
            rr *= 0.5
            t[i, j] = min(max(int(math.floor(256 * rr)), 0), 255)
    if motion in ("sweep", "hsweep"):
        t[:, w // 2] = 255
        t[:, int(x)] = 255
    return t, x, y


def _run_frames(desc, count):
    p = parse_launch(desc)
    p.run()
    sink = p.get_by_name("out")
    frames = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = [np.asarray(x) for x in s.buffer.data]
        for k in range(d[0].shape[0]):
            frames.append(tuple(x[k] for x in d))
    assert len(frames) == count
    return frames


class TestBall:
    @pytest.mark.parametrize("motion", ["wavy", "sweep", "hsweep"])
    def test_matches_scalar_gold(self, motion):
        w, h = 48, 40
        src = VideoTestSrc(**{"pattern": "ball", "motion": motion})
        from gstreamer_tpu.video.info import VideoInfo
        src._info = VideoInfo(format="AYUV", width=w, height=h)
        fg = src._canon_color(src._prop_color("foreground-color"))
        bg = src._canon_color(src._prop_color("background-color"))
        for n in (0, 13, 60, 137):
            got = src._draw_ball(w, h, fg, bg, n)
            t, x, y = _gold_ball_coverage(w, h, n, motion)
            gold = np.zeros((h, w, 4), np.int32)
            for c in range(4):
                gold[..., c] = _blend(fg[c], bg[c], t)
            if motion in ("sweep", "hsweep"):
                line = np.array([_blend(fg[c], bg[c], 255)
                                 for c in range(4)], np.int32)
                gold[h // 2] = line
                yi = int(y)
                if 0 <= yi < h:
                    gold[yi] = line
            np.testing.assert_array_equal(got, gold, err_msg=f"n={n}")

    def test_animates_in_pipeline(self):
        frames = _run_frames(
            "videotestsrc num-buffers=5 pattern=ball ! "
            "video/x-raw,format=I420,width=64,height=48,framerate=10/1 ! "
            "appsink name=out", 5)
        assert not np.array_equal(frames[0][0], frames[1][0])
        # bright disc on dark background
        assert frames[0][0].max() == 235 and frames[0][0].min() == 16

    def test_flip_swaps_colors(self):
        # frames mode: flipit = (n // 50) % 2 -> frame 50 is inverted
        w, h = 32, 32
        src = VideoTestSrc(pattern="ball", flip=True)
        from gstreamer_tpu.video.info import VideoInfo
        src._info = VideoInfo(format="AYUV", width=w, height=h)
        fg = src._canon_color(src._prop_color("foreground-color"))
        bg = src._canon_color(src._prop_color("background-color"))
        f49 = src._draw_ball(w, h, fg, bg, 49)
        f50 = src._draw_ball(w, h, fg, bg, 50)
        # at n=50 the background pixels take the foreground color
        assert f49[0, 0, 1] != f50[0, 0, 1]


class TestBlinkScroll:
    def test_blink_alternates(self):
        frames = _run_frames(
            "videotestsrc num-buffers=4 pattern=blink ! "
            "video/x-raw,format=I420,width=16,height=16 ! "
            "appsink name=out", 4)
        ys = [int(f[0][0, 0]) for f in frames]
        assert ys == [16, 235, 16, 235]

    def test_horizontal_speed_rolls(self):
        frames = _run_frames(
            "videotestsrc num-buffers=3 pattern=smpte75 "
            "horizontal-speed=4 ! "
            "video/x-raw,format=I420,width=64,height=16 ! "
            "appsink name=out", 3)
        np.testing.assert_array_equal(
            frames[1][0], np.roll(frames[0][0], -4, axis=1))
        np.testing.assert_array_equal(
            frames[2][0], np.roll(frames[0][0], -8, axis=1))


class TestZonePlateMotion:
    def test_kt_animates(self):
        frames = _run_frames(
            "videotestsrc num-buffers=3 pattern=zone-plate kt=8 kx2=20 "
            "ky2=20 ! video/x-raw,format=I420,width=32,height=32 ! "
            "appsink name=out", 3)
        assert not np.array_equal(frames[0][0], frames[1][0])
        assert not np.array_equal(frames[1][0], frames[2][0])

    def test_static_without_t_terms(self):
        frames = _run_frames(
            "videotestsrc num-buffers=2 pattern=zone-plate kx2=20 ky2=20 "
            "! video/x-raw,format=I420,width=32,height=32 ! "
            "appsink name=out", 2)
        np.testing.assert_array_equal(frames[0][0], frames[1][0])


def test_colors_pattern_exact():
    """gst_video_test_src_colors exact port: A=255, Y=(i*4096/w)%256,
    U=((j*16/h)<<4)|(i*16/w), V=(j*4096/h)%256."""
    frames = _run_frames(
        "videotestsrc num-buffers=1 pattern=colors ! "
        "video/x-raw,format=AYUV,width=32,height=24 ! appsink name=out", 1)
    y, u, v, a = frames[0]
    jj, ii = np.mgrid[0:24, 0:32]
    np.testing.assert_array_equal(y, (ii * 4096 // 32) % 256)
    np.testing.assert_array_equal(u, ((jj * 16 // 24) << 4)
                                  | (ii * 16 // 32))
    np.testing.assert_array_equal(v, (jj * 4096 // 24) % 256)
    assert (a == 255).all()
