"""zebrastripe/scenechange/videodiff/accurip."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.videofilters_bad import _IGNORED


class TestZebraStripe:
    def test_stripes_only_above_threshold(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 pattern=white ! "
            "video/x-raw,format=I420,width=32,height=24 ! "
            "zebrastripe threshold=90 ! appsink name=out")
        p.run()
        frames = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            d = [np.asarray(x) for x in s.buffer.data]
            for k in range(d[0].shape[0]):
                frames.append(d[0][k])
        jj, ii = np.mgrid[0:24, 0:32]
        # white Y=235 >= 16+floor(0.5+2.19*90)=213 -> stripes where
        # (i+j+t)&4 with t = frame index
        for t, f in enumerate(frames):
            stripe = ((ii + jj + t) & 4).astype(bool)
            np.testing.assert_array_equal(
                f, np.where(stripe, 16, 235))

    def test_dark_untouched(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=black ! "
            "video/x-raw,format=I420,width=32,height=24 ! "
            "zebrastripe ! appsink name=out")
        p.run()
        y = np.asarray(p.get_by_name("out").pull_sample().buffer.data[0])
        assert (y == 16).all()


class TestSceneChange:
    def test_detects_cut(self):
        p = parse_launch(
            "appsrc name=in ! video/x-raw,format=I420,width=32,"
            "height=24,framerate=10/1 ! scenechange ! fakesink")
        src = p.get_by_name("in")
        black = [np.zeros((1, 24, 32), np.uint8),
                 np.full((1, 12, 16), 128, np.uint8),
                 np.full((1, 12, 16), 128, np.uint8)]
        white = [np.full((1, 24, 32), 235, np.uint8),
                 np.full((1, 12, 16), 128, np.uint8),
                 np.full((1, 12, 16), 128, np.uint8)]
        for _ in range(8):
            src.push_buffer(Buffer(data=black, batch=1))
        for _ in range(4):
            src.push_buffer(Buffer(data=white, batch=1))
        src.end_of_stream()
        p.run()
        msgs = []
        while (m := p.bus.pop()) is not None:
            if m.type == "element" \
                    and m.data.get("name") == "GstForceKeyUnit":
                msgs.append(m)
        assert len(msgs) == 1


class TestVideoDiff:
    def test_static_passthrough_then_stripes(self):
        p = parse_launch(
            "appsrc name=in ! video/x-raw,format=I420,width=32,"
            "height=24,framerate=10/1 ! videodiff ! appsink name=out")
        src = p.get_by_name("in")
        a = [np.full((1, 24, 32), 100, np.uint8),
             np.full((1, 12, 16), 128, np.uint8),
             np.full((1, 12, 16), 128, np.uint8)]
        b = [np.full((1, 24, 32), 200, np.uint8),
             np.full((1, 12, 16), 128, np.uint8),
             np.full((1, 12, 16), 128, np.uint8)]
        src.push_buffer(Buffer(data=a, batch=1))
        src.push_buffer(Buffer(data=a, batch=1))
        src.push_buffer(Buffer(data=b, batch=1))
        src.end_of_stream()
        p.run()
        frames = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            frames.append(np.asarray(s.buffer.data[0])[0])
        # frame 1 static: untouched; frame 2 differs: 16/240 pattern
        np.testing.assert_array_equal(frames[1], 100)
        assert set(np.unique(frames[2])) == {16, 240}


class TestAccuRip:
    def _gold(self, x, first=False, last=False):
        crc = crc_v2 = 0
        num = 0
        ring = [(0, 0)] * (_IGNORED + 1)
        ring_n = 0
        for l, r in x.astype(np.int64):
            num += 1
            if first and num < _IGNORED:
                continue
            word = (int(l) & 0xFFFF) | ((int(r) & 0xFFFF) << 16)
            mult = word * num
            crc = (crc + mult) & 0xFFFFFFFF
            crc_v2 = (crc_v2 + (mult & 0xFFFFFFFF)
                      + (mult >> 32)) & 0xFFFFFFFF
            if last:
                ring[ring_n % (_IGNORED + 1)] = (crc, crc_v2)
                ring_n += 1
        if last and ring_n > _IGNORED:
            return ring[(ring_n - _IGNORED) % (_IGNORED + 1)]
        return crc, crc_v2

    @pytest.mark.parametrize("first,last", [(False, False),
                                            (True, False),
                                            (False, True)])
    def test_matches_gold(self, first, last):
        rng = np.random.default_rng(0)
        n = _IGNORED + 5000
        x = rng.integers(-30000, 30000, (n, 2)).astype(np.int16)
        p = parse_launch(
            f"appsrc name=in ! audio/x-raw,format=S16LE,rate=44100,"
            f"channels=2 ! accurip first-track={str(first).lower()} "
            f"last-track={str(last).lower()} ! fakesink")
        src = p.get_by_name("in")
        for i in range(0, n, 4000):
            src.push_buffer(Buffer(data=x[i:i + 4000]))
        src.end_of_stream()
        p.run()
        tags = None
        while (m := p.bus.pop()) is not None:
            if m.type == "tag" and "accurip-crc" in m.data:
                tags = m.data
        want = self._gold(x, first, last)
        assert (tags["accurip-crc"], tags["accurip-crc-v2"]) == want
