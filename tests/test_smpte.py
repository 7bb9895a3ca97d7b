"""SMPTE transition masks + smpte/smptealpha elements."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.video.smpte_mask import (MASK_TYPES, mask_factory_new,
                                            paint_vbox)


class TestMask:
    def test_bar_wipe_lr_gradient(self):
        # type 1: single vbox over the full frame (barboxwipes.c boxes_1b)
        m = mask_factory_new(1, False, 16, 64, 32)
        depth = 1 << 16
        j = np.arange(64)
        expect = (depth * j) // 64
        assert np.array_equal(m[0], expect)
        assert np.array_equal(m[31], expect)

    def test_bar_wipe_tb_gradient(self):
        m = mask_factory_new(2, False, 16, 64, 32)
        depth = 1 << 16
        i = np.arange(32)
        expect = (depth * i) // 32
        assert np.array_equal(m[:, 0], expect)
        assert np.array_equal(m[:, 63], expect)

    def test_invert(self):
        m = mask_factory_new(1, False, 16, 32, 16)
        mi = mask_factory_new(1, True, 16, 32, 16)
        assert np.array_equal(mi, (1 << 16) - m)

    def test_box_wipe_corners(self):
        # type 3: expands from upper-left; mask low at TL, high at BR
        # (the reference's scanline loop draws rows [y0, y2) — the very
        # last row stays 0, like paint.c)
        m = mask_factory_new(3, False, 16, 64, 64)
        assert m[0, 0] < m[62, 62]
        assert m[0, 0] <= (1 << 16) // 8

    def test_all_types_rasterize(self):
        for t in MASK_TYPES:
            m = mask_factory_new(t, False, 8, 40, 24)
            assert m is not None and m.shape == (24, 40), t
            assert m.min() >= 0
            # edge interpolation may overshoot (1<<bpp) by a few counts —
            # the reference's STEP_3D_LINE macro does the same (its third
            # branch subtracts dzabs from the wrong error terms); the
            # blend clamps, so this is harmless and bit-faithful.
            assert m.max() <= (1 << 8) + 8, t

    def test_barndoor_v_symmetric(self):
        # type 21: central vertical split, symmetric about the middle
        # left box: c = depth*(32-j)//32, right box: c = depth*(j-32)//32
        m = mask_factory_new(21, False, 16, 64, 32)
        assert m[0, 1] == m[0, 63]
        assert m[0, 31] == m[0, 33]

    def test_paint_vbox_exact(self):
        dest = np.zeros((4, 8), np.int64)
        paint_vbox(dest, 8, 2, 1, 10, 6, 3, 50)
        # dest[j] = (c1*j + c0*(w-j))//w over width 4
        for j in range(4):
            assert dest[1, 2 + j] == (50 * j + 10 * (4 - j)) // 4
        assert dest[0, 2] == 0   # untouched outside box


class TestSmpteElement:
    def _run(self, n, duration_ns, ty=1, border=0, w=32, h=16):
        pipe = parse_launch(
            f"smpte name=s type={ty} border={border} duration={duration_ns} ! "
            f"appsink name=out "
            f"videotestsrc pattern=black num-buffers={n} ! "
            f"video/x-raw,format=I420,width={w},height={h},framerate=10/1 ! s.sink_0 "
            f"videotestsrc pattern=white num-buffers={n} ! "
            f"video/x-raw,format=I420,width={w},height={h},framerate=10/1 ! s.sink_1")
        pipe.run()
        sink = pipe.get_by_name("out")
        frames = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            y = np.asarray(s.buffer.data[0])
            for k in range(y.shape[0]):
                frames.append(y[k])
        return frames

    def test_transition_first_to_second(self):
        # 10 fps, 1s duration -> transition over 10 frames
        frames = self._run(12, 1_000_000_000)
        # frame 0: pos=0 -> value=256 everywhere -> input 1 (black, Y=16)
        assert int(frames[0].max()) == 16
        # last frames: past end -> input 2 (white, Y=235)
        assert int(frames[-1].min()) == 235
        # mid-transition: left side white (mask low -> in2), right black
        mid = frames[5]
        assert int(mid[0, 0]) == 235
        assert int(mid[0, -1]) == 16

    def test_bar_wipe_exact_column(self):
        # exact split column at pos: mask[j] = (depth*j)//W;
        # value==0 (shows in2) iff mask[j] < pos-border(=1 -> border->1)
        frames = self._run(12, 1_000_000_000, ty=1, w=32, h=16)
        depth = 1 << 16
        maskrow = (depth * np.arange(32)) // 32
        f = 3
        pos = (depth + 0) * f // 10
        border = 1
        mn = pos - border
        value = ((np.clip(maskrow, mn, pos) - mn) << 8) // border
        expect = ((16 * value) + 235 * (256 - value)) >> 8
        assert np.array_equal(frames[f][0], expect)

    def test_smptealpha_position(self):
        pipe = parse_launch(
            "videotestsrc pattern=white num-buffers=1 ! "
            "video/x-raw,format=AYUV,width=32,height=16 ! "
            "smptealpha name=sa type=1 position=0.5 ! appsink name=out")
        pipe.run()
        data = pipe.get_by_name("out").pull_sample().buffer.data
        a = np.asarray(data[3])[0]
        # left half: mask < pos-border -> alpha 0; right: alpha preserved
        assert int(a[0, 0]) == 0
        assert int(a[0, -1]) == 255

    def test_smptealpha_position_zero_full_coverage(self):
        pipe = parse_launch(
            "videotestsrc pattern=white num-buffers=1 ! "
            "video/x-raw,format=AYUV,width=16,height=8 ! "
            "smptealpha type=1 position=0.0 ! appsink name=out")
        pipe.run()
        a = np.asarray(pipe.get_by_name("out").pull_sample().buffer.data[3])[0]
        assert int(a.min()) == 255   # pos=0 -> value=256 -> alpha kept
