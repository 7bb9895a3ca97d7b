"""textoverlay family: placement, per-frame time stamps, textrender."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.textoverlay import (TimeOverlay,
                                                render_text_argb)


def _frames(desc, n):
    p = parse_launch(desc)
    p.run()
    sink = p.get_by_name("out")
    out = []
    while (s := sink.pull_sample()) is not None:
        d = [np.asarray(x) for x in s.buffer.data] \
            if isinstance(s.buffer.data, (list, tuple)) \
            else [np.asarray(s.buffer.data)]
        for k in range(d[0].shape[0]):
            out.append(tuple(x[k] for x in d))
    assert len(out) == n
    return out


class TestRenderTime:
    def test_format_matches_reference(self):
        # gsttimeoverlay.c:154 "%u:%02u:%02u.%03u"
        assert TimeOverlay.render_time(0) == "0:00:00.000"
        assert TimeOverlay.render_time(1_500_000_000) == "0:00:01.500"
        assert TimeOverlay.render_time(
            3_600_000_000_000 + 61_007_000_000) == "1:01:01.007"


class TestTextOverlay:
    def test_draws_glyphs(self):
        frames = _frames(
            "videotestsrc num-buffers=1 pattern=black ! "
            "video/x-raw,format=I420,width=160,height=120 ! "
            "textoverlay text=HELLO ! appsink name=out", 1)
        y = frames[0][0]
        assert (y > 200).sum() > 50       # bright glyph pixels exist

    def test_empty_text_passthrough(self):
        a = _frames(
            "videotestsrc num-buffers=1 ! "
            "video/x-raw,format=I420,width=64,height=48 ! "
            "textoverlay ! appsink name=out", 1)
        b = _frames(
            "videotestsrc num-buffers=1 ! "
            "video/x-raw,format=I420,width=64,height=48 ! "
            "appsink name=out", 1)
        np.testing.assert_array_equal(a[0][0], b[0][0])

    def test_alignment_moves_text(self):
        base = ("videotestsrc num-buffers=1 pattern=black ! "
                "video/x-raw,format=I420,width=160,height=120 ! "
                "textoverlay text=X valignment={v} halignment={h} ! "
                "appsink name=out")
        top = _frames(base.format(v="top", h="left"), 1)[0][0]
        bot = _frames(base.format(v="bottom", h="right"), 1)[0][0]
        ty, tx = np.where(top > 200)
        by, bx = np.where(bot > 200)
        assert ty.mean() < 60 < by.mean()
        assert tx.mean() < 80 < bx.mean()

    def test_rgb_output_format(self):
        frames = _frames(
            "videotestsrc num-buffers=1 pattern=black ! "
            "video/x-raw,format=RGBA,width=160,height=120 ! "
            "textoverlay text=HELLO ! appsink name=out", 1)
        r = frames[0][0]
        assert (r > 200).sum() > 50


class TestTimeOverlay:
    def test_each_frame_distinct_stamp(self):
        frames = _frames(
            "videotestsrc num-buffers=4 pattern=black ! "
            "video/x-raw,format=I420,width=160,height=120,"
            "framerate=2/1 ! timeoverlay ! appsink name=out", 4)
        # successive half-second stamps must differ pixel-wise
        assert not np.array_equal(frames[0][0], frames[1][0])
        assert not np.array_equal(frames[1][0], frames[2][0])
        # all have glyphs near the top (default valignment=top)
        for f in frames:
            ys = np.where(f[0] > 200)[0]
            assert len(ys) and ys.mean() < 60


class TestClockOverlay:
    def test_draws_wall_clock(self):
        frames = _frames(
            "videotestsrc num-buffers=1 pattern=black ! "
            "video/x-raw,format=I420,width=160,height=120 ! "
            "clockoverlay ! appsink name=out", 1)
        assert (frames[0][0] > 200).sum() > 30


class TestTextRender:
    def test_renders_bitmap(self):
        argb = render_text_argb("Hi", 18)
        assert argb.ndim == 3 and argb.shape[2] == 4
        assert argb[..., 0].max() == 255      # alpha hits opaque
        assert argb[..., 1].max() == 255      # white glyph

    def test_textrender_element(self):
        from gstreamer_tpu.core.buffer import Buffer
        p = parse_launch(
            "appsrc name=in ! text/x-raw,format=utf8 ! textrender ! "
            "video/x-raw,format=ARGB,width=160,height=60 ! "
            "appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=[b"Hello"]))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        d = [np.asarray(x) for x in s.buffer.data]
        assert d[0].shape[-2:] == (60, 160)
        assert max(x.max() for x in d) == 255
