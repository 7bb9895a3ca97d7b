"""inter bridges, netsim, segmentclip."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.inter_netsim import _SURFACES


class TestInter:
    def test_video_bridge(self):
        _SURFACES.clear()
        p1 = parse_launch(
            "videotestsrc num-buffers=3 pattern=gradient ! "
            "video/x-raw,format=I420,width=32,height=24 ! "
            "intervideosink channel=cam1")
        p1.run()
        p2 = parse_launch(
            "intervideosrc channel=cam1 ! appsink name=out")
        p2.run()
        n = 0
        while (s := p2.get_by_name("out").pull_sample()) is not None:
            n += np.asarray(s.buffer.data[0]).shape[0]
            assert s.caps[0]["width"] == 32
        assert n == 3

    def test_audio_bridge(self):
        _SURFACES.clear()
        p1 = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=500 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "interaudiosink channel=mic")
        p1.run()
        p2 = parse_launch(
            "interaudiosrc channel=mic ! appsink name=out")
        p2.run()
        n = 0
        while (s := p2.get_by_name("out").pull_sample()) is not None:
            n += np.asarray(s.buffer.data).shape[0]
        assert n == 1000


class TestNetSim:
    def _run(self, nbuf, **props):
        propstr = " ".join(f"{k}={v}" for k, v in props.items())
        p = parse_launch(
            f"audiotestsrc num-buffers={nbuf} samplesperbuffer=100 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"netsim {propstr} ! appsink name=out")
        p.run()
        n = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            n += 1
        return n

    def test_passthrough(self):
        assert self._run(10) == 10

    def test_drop_packets(self):
        assert self._run(10, **{"drop-packets": 4}) == 6

    def test_drop_probability_deterministic(self):
        a = self._run(50, **{"drop-probability": 0.5, "seed": 3})
        b = self._run(50, **{"drop-probability": 0.5, "seed": 3})
        assert a == b and 5 < a < 45


class TestSegmentClip:
    def test_audio_clip_sample_accurate(self):
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=S16LE,rate=1000,"
            "channels=1 ! audiosegmentclip start=250000000 "
            "stop=750000000 ! appsink name=out")
        src = p.get_by_name("in")
        x = np.arange(1000, dtype=np.int16)[:, None]
        src.push_buffer(Buffer(data=x, pts=0,
                               duration=1_000_000_000))
        src.end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        got = np.asarray(s.buffer.data)
        # rate 1000: samples 250..749
        np.testing.assert_array_equal(got[:, 0],
                                      np.arange(250, 750))
        assert s.buffer.pts == 250_000_000

    def test_video_drops_outside(self):
        p = parse_launch(
            "videotestsrc num-buffers=10 ! "
            "video/x-raw,format=I420,width=16,height=16,"
            "framerate=10/1 ! videosegmentclip start=300000000 "
            "stop=700000000 ! appsink name=out")
        p.run()
        n = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            n += s.buffer.batch
        assert n == 4          # frames at 300,400,500,600ms
