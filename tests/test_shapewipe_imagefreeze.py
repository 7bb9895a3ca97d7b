"""shapewipe blend-kernel parity vs a scalar gold of
CREATE_ARGB_FUNCTIONS (gstshapewipe.c:764-831) + imagefreeze
freeze/num-buffers semantics."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


def gold_shapewipe_alpha(mask, alpha, position, border, mask16=False):
    """Scalar port of the blend macro for the A component."""
    position = np.float32(position)
    border = np.float32(border)
    low = np.float32(position - border / np.float32(2.0))
    high = np.float32(position + border / np.float32(2.0))
    if low < 0.0:
        low = high = np.float32(0.0)
    if high > 1.0:
        low = high = np.float32(1.0)
    low_i = int(np.float32(low) * 65536)
    high_i = int(np.float32(high) * 65536)
    round_i = (high_i - low_i) >> 1
    out = np.empty_like(alpha)
    h, w = mask.shape
    for i in range(h):
        for j in range(w):
            m = int(mask[i, j]) if mask16 else int(mask[i, j]) << 8
            a = int(alpha[i, j])
            if m < low_i:
                out[i, j] = 0
            elif m >= high_i:
                out[i, j] = a
            else:
                val = (((m - low_i) << 16) + round_i) // (high_i - low_i)
                out[i, j] = (val * a + 32768) >> 16
    return out


def _run_wipe(mask, position, border, fmt="GRAY8"):
    from gstreamer_tpu.core.buffer import Buffer

    h, w = mask.shape
    p = parse_launch(
        f"videotestsrc num-buffers=1 pattern=white ! "
        f"video/x-raw,format=AYUV,width={w},height={h} ! "
        f"shapewipe name=s position={position} border={border} ! "
        f"appsink name=out   "
        f"appsrc name=m ! video/x-raw,format={fmt},width={w},"
        f"height={h},framerate=30/1 ! s.mask_sink")
    p.get_by_name("m").push_buffer(Buffer(data=[mask[None]]))
    p.get_by_name("m").end_of_stream()
    p.run()
    s = p.get_by_name("out").pull_sample()
    return [np.asarray(pl)[0] for pl in s.buffer.data]


class TestShapeWipe:
    @pytest.mark.parametrize("pos,border", [(0.0, 0.0), (0.5, 0.0),
                                            (0.5, 0.4), (1.0, 0.1),
                                            (0.05, 0.2), (0.97, 0.1)])
    def test_alpha_matches_gold_gray8(self, pos, border):
        rng = np.random.default_rng(11)
        mask = rng.integers(0, 256, (16, 16), np.uint8)
        planes = _run_wipe(mask, pos, border)
        y, u, v, a = planes
        gold = gold_shapewipe_alpha(mask, np.full((16, 16), 255,
                                                  np.uint8), pos, border)
        np.testing.assert_array_equal(a, gold)
        # color components untouched (white pattern)
        assert (y == 235).all()

    def test_gray16_mask(self):
        rng = np.random.default_rng(3)
        mask = rng.integers(0, 65536, (8, 8)).astype(np.uint16)
        planes = _run_wipe(mask, 0.4, 0.3, fmt="GRAY16_LE")
        gold = gold_shapewipe_alpha(mask, np.full((8, 8), 255, np.uint8),
                                    0.4, 0.3, mask16=True)
        np.testing.assert_array_equal(planes[3], gold)

    def test_position_zero_all_visible(self):
        mask = np.zeros((8, 8), np.uint8)
        planes = _run_wipe(mask, 0.0, 0.0)
        # low=high=0: every mask value >= high_i -> alpha preserved
        assert (planes[3] == 255).all()

    def test_position_one_all_hidden(self):
        mask = np.full((8, 8), 200, np.uint8)
        planes = _run_wipe(mask, 1.0, 0.0)
        # mask<<8 = 51200 < 65536 -> alpha 0
        assert (planes[3] == 0).all()

    def test_mask_size_mismatch_rejected(self):
        from gstreamer_tpu.core.buffer import Buffer
        from gstreamer_tpu.core.pipeline import NegotiationError
        p = parse_launch(
            "videotestsrc num-buffers=1 ! "
            "video/x-raw,format=AYUV,width=32,height=24 ! "
            "shapewipe name=s ! fakesink   "
            "videotestsrc num-buffers=1 ! "
            "video/x-raw,format=GRAY8,width=16,height=16 ! s.mask_sink")
        with pytest.raises(NegotiationError):
            p.run()


class TestImageFreeze:
    def _run(self, desc, nframes):
        p = parse_launch(desc)
        p.run()
        sink = p.get_by_name("out")
        frames = []
        while (s := sink.pull_sample()) is not None:
            d = [np.asarray(x) for x in s.buffer.data]
            for k in range(d[0].shape[0]):
                frames.append(tuple(x[k] for x in d))
        assert len(frames) == nframes, len(frames)
        return frames

    def test_freezes_first_frame(self):
        frames = self._run(
            "videotestsrc num-buffers=5 pattern=ball ! "
            "video/x-raw,format=I420,width=32,height=24,framerate=10/1 "
            "! imagefreeze ! appsink name=out", 5)
        for f in frames[1:]:
            np.testing.assert_array_equal(f[0], frames[0][0])

    def test_num_buffers_truncates(self):
        self._run(
            "videotestsrc num-buffers=10 ! "
            "video/x-raw,format=I420,width=32,height=24 ! "
            "imagefreeze num-buffers=3 ! appsink name=out", 3)
