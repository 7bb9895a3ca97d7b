"""GstHarness depth: sub-harnesses, test-clock cranking, event push
(gstharness.c gst_harness_add_src/add_sink/crank_single_clock_wait)."""

import numpy as np

from gstreamer_tpu.check.harness import Harness


class TestSubHarness:
    def test_src_harness_feeds_element(self):
        h = Harness("videoconvert")
        h.set_caps("video/x-raw,format=I420,width=16,height=16,"
                   "framerate=30/1",
                   "video/x-raw,format=RGB,width=16,height=16")
        h.add_src("videotestsrc num-buffers=3 pattern=gradient ! "
                  "video/x-raw,format=I420,width=16,height=16,"
                  "framerate=30/1")
        outs = []
        for _ in range(3):
            r = h.push_from_src()
            if r is not None:
                outs.append(r)
        assert len(outs) >= 2
        arr = np.asarray(outs[0].data[0] if isinstance(outs[0].data,
                                                       (tuple, list))
                         else outs[0].data)
        assert arr.size > 0

    def test_sink_harness_consumes_output(self):
        h = Harness("identity")
        h.set_caps("audio/x-raw,format=S16LE,rate=8000,channels=1,"
                   "layout=interleaved")
        h.add_sink("volume volume=0.5")
        x = (np.arange(64, dtype=np.int16) * 100)
        h.push(x, pts=0)
        out = h.push_to_sink()
        assert out is not None
        got = np.asarray(out.data)
        np.testing.assert_allclose(got[:8], (x[:8] * 0.5).astype(got.dtype),
                                   atol=1)

    def test_buffers_received(self):
        h = Harness("identity")
        h.set_caps("audio/x-raw,format=S16LE,rate=8000,channels=1,"
                   "layout=interleaved")
        for k in range(3):
            h.push(np.zeros(16, np.int16), pts=k)
        assert h.buffers_received == 3


class TestTestClockCrank:
    def test_clocksync_gates_on_testclock(self):
        h = Harness("clocksync sync=true")
        clock = h.use_testclock()
        h.set_caps("audio/x-raw,format=S16LE,rate=8000,channels=1,"
                   "layout=interleaved")
        # a buffer 1s in the future is held
        out = h.push(np.ones(16, np.int16), pts=1_000_000_000)
        assert out is None
        assert clock._waits, "no clock wait registered"
        # crank: clock jumps to the wait; buffer released on next tick
        assert h.crank_single_clock_wait()
        assert clock.get_time() >= 1_000_000_000
        out = h.push(np.full(16, 2, np.int16), pts=2_000_000_000)
        assert out is not None
        np.testing.assert_array_equal(np.asarray(out),
                                      np.ones(16, np.int16))

    def test_clocksync_passthrough_without_clock(self):
        h = Harness("clocksync sync=true")
        h.set_caps("audio/x-raw,format=S16LE,rate=8000,channels=1,"
                   "layout=interleaved")
        out = h.push(np.ones(16, np.int16), pts=1_000_000_000)
        assert out is not None
