"""timecodestamper/avwait/combdetect/ivtc/compare/audiolatency
(gst-plugins-bad timecode, ivtc, compare, audiolatency)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.timecode_misc import frames_to_timecode


class TestTimecodeMath:
    def test_non_drop(self):
        assert frames_to_timecode(0, 25, 1, False) == (0, 0, 0, 0)
        assert frames_to_timecode(25, 25, 1, False) == (0, 0, 1, 0)
        assert frames_to_timecode(25 * 3600, 25, 1, False) == \
            (1, 0, 0, 0)

    def test_drop_frame_2997(self):
        # SMPTE 12M: 00:01:00;02 follows 00:00:59;29
        assert frames_to_timecode(1799, 30000, 1001, True) == \
            (0, 0, 59, 29)
        assert frames_to_timecode(1800, 30000, 1001, True) == \
            (0, 1, 0, 2)
        # every 10th minute is NOT dropped
        assert frames_to_timecode(17982, 30000, 1001, True) == \
            (0, 10, 0, 0)


class TestTimecodeStamper:
    def test_metas_attached(self):
        p = parse_launch(
            "videotestsrc num-buffers=6 ! video/x-raw,format=GRAY8,"
            "width=16,height=16,framerate=3/1 ! timecodestamper ! "
            "appsink name=out")
        p.run()
        tcs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            tcs.extend((s.buffer.meta or {}).get("timecode", []))
        assert tcs[0] == (0, 0, 0, 0)
        assert tcs[3] == (0, 0, 1, 0)            # 3 fps
        assert len(tcs) == 6

    def test_messages(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 ! video/x-raw,format=GRAY8,"
            "width=8,height=8,framerate=5/1 ! timecodestamper "
            "post-messages=true ! fakesink")
        p.run()
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "timecodestamper"]
        assert len(msgs) == 2
        assert msgs[0].data["timecode"] == "00:00:00:00"


class TestAvWait:
    def test_running_time_gate(self):
        p = parse_launch(
            "videotestsrc num-buffers=10 ! video/x-raw,format=GRAY8,"
            "width=8,height=8,framerate=5/1 ! avwait "
            "target-running-time=1000000000 ! appsink name=out")
        p.run()
        n = sum((s.buffer.batch or 1) for s in
                iter(lambda: p.get_by_name("out").pull_sample(),
                     None))
        assert n == 5

    def test_end_time_and_valve(self):
        p = parse_launch(
            "videotestsrc num-buffers=10 ! video/x-raw,format=GRAY8,"
            "width=8,height=8,framerate=5/1 ! avwait "
            "end-running-time=600000000 ! appsink name=out")
        p.run()
        n = sum((s.buffer.batch or 1) for s in
                iter(lambda: p.get_by_name("out").pull_sample(),
                     None))
        assert n == 3                            # 0, 0.2, 0.4s
        p2 = parse_launch(
            "videotestsrc num-buffers=4 ! video/x-raw,format=GRAY8,"
            "width=8,height=8 ! avwait recording=false ! appsink "
            "name=out")
        p2.run()
        assert p2.get_by_name("out").pull_sample() is None


class TestCombDetect:
    def test_combing_painted(self):
        cd = element_factory_make("combdetect")
        cd.start()
        y = np.zeros((1, 32, 32), np.uint8)
        y[0, ::2] = 200
        u = np.zeros((1, 16, 16), np.uint8)
        v = np.zeros((1, 16, 16), np.uint8)
        out = cd.host_process(Buffer(data=(y, u, v), pts=0, batch=1))
        oy = np.asarray(out.data[0])[0]
        assert ((oy == 16) | (oy == 235)).any()

    def test_clean_frame_untouched_interior(self):
        cd = element_factory_make("combdetect")
        cd.start()
        y = np.full((1, 32, 32), 100, np.uint8)
        u = np.zeros((1, 16, 16), np.uint8)
        v = np.zeros((1, 16, 16), np.uint8)
        out = cd.host_process(Buffer(data=(y, u, v), pts=0, batch=1))
        oy = np.asarray(out.data[0])[0]
        np.testing.assert_array_equal(oy[2:30], y[0, 2:30])
        np.testing.assert_array_equal(oy[0], y[0, 0] // 2)


class TestIvtc:
    def test_drops_duplicates(self):
        ivtc = element_factory_make("ivtc")
        ivtc.start()
        rng = np.random.default_rng(0)
        a = rng.integers(0, 255, (32, 32)).astype(np.uint8)
        b = rng.integers(0, 255, (32, 32)).astype(np.uint8)
        y = np.stack([a, a, b])                  # a duplicated
        u = np.zeros((3, 16, 16), np.uint8)
        v = np.zeros((3, 16, 16), np.uint8)
        out = ivtc.host_process(Buffer(data=(y, u, v), pts=0,
                                       batch=3))
        assert out.batch == 2


class TestCompare:
    def test_equal_streams(self):
        p = parse_launch(
            "compare name=c videotestsrc num-buffers=2 ! "
            "video/x-raw,format=GRAY8,width=16,height=16 ! tee "
            "name=t t. ! c.sink t. ! c.check c. ! fakesink")
        p.run()
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element" and m.data.get("name")
                == "delta"]
        assert msgs and all(m.data["equal"] for m in msgs)

    def test_different_streams(self):
        p = parse_launch(
            "compare name=c method=max "
            "videotestsrc num-buffers=1 pattern=black ! "
            "video/x-raw,format=GRAY8,width=16,height=16 ! c.sink "
            "videotestsrc num-buffers=1 pattern=white ! "
            "video/x-raw,format=GRAY8,width=16,height=16 ! c.check "
            "c. ! fakesink")
        p.run()
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element" and m.data.get("name")
                == "delta"]
        assert msgs and msgs[0].data["delta"] > 100
        assert not msgs[0].data["equal"]


class TestAudioLatency:
    def test_spike_detection(self):
        al = element_factory_make("audiolatency")
        from gstreamer_tpu.core.caps import Caps
        al.set_info(Caps.from_string(
            "audio/x-raw, format=F32LE, rate=48000, channels=1"),
            None)
        x = np.zeros((4800, 1), np.float32)
        x[2400] = 0.9
        out = al.host_process(Buffer(data=x, pts=1_000_000_000))
        assert out is not None
        assert al.last_latency_ns == 1_000_000_000 + 50_000_000
