"""deinterleave/interleave channel split and merge."""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


def _collect(sink):
    out = []
    while (s := sink.pull_sample()) is not None:
        out.append(np.asarray(s.buffer.data))
    return np.concatenate(out, axis=0) if out else None


class TestDeinterleave:
    def test_channels_split(self):
        rng = np.random.default_rng(2)
        x = (rng.standard_normal((400, 3)) * 1000).astype(np.int16)
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=S16LE,rate=8000,"
            "channels=3 ! deinterleave name=d "
            "d.src_0 ! appsink name=o0 "
            "d.src_1 ! appsink name=o1 "
            "d.src_2 ! appsink name=o2")
        p.get_by_name("in").push_buffer(Buffer(data=x))
        p.get_by_name("in").end_of_stream()
        p.run()
        for k in range(3):
            got = _collect(p.get_by_name(f"o{k}"))
            np.testing.assert_array_equal(got[:, 0], x[:, k])


class TestInterleave:
    def test_merge_roundtrip(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((300, 2)).astype(np.float64)
        p = parse_launch(
            "interleave name=i ! appsink name=out "
            "appsrc name=a ! audio/x-raw,format=F64LE,rate=8000,"
            "channels=1 ! i.sink_0 "
            "appsrc name=b ! audio/x-raw,format=F64LE,rate=8000,"
            "channels=1 ! i.sink_1")
        p.get_by_name("a").push_buffer(Buffer(data=x[:, :1]))
        p.get_by_name("a").end_of_stream()
        p.get_by_name("b").push_buffer(Buffer(data=x[:, 1:]))
        p.get_by_name("b").end_of_stream()
        p.run()
        got = _collect(p.get_by_name("out"))
        np.testing.assert_array_equal(got, x)

    def test_caps_channels_count(self):
        p = parse_launch(
            "interleave name=i ! appsink name=out "
            "audiotestsrc num-buffers=1 samplesperbuffer=100 ! "
            "audio/x-raw,format=F32LE,rate=8000,channels=1 ! i.sink_0 "
            "audiotestsrc num-buffers=1 samplesperbuffer=100 wave=saw "
            "! audio/x-raw,format=F32LE,rate=8000,channels=1 ! i.sink_1")
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert s.caps[0]["channels"] == 2
        assert np.asarray(s.buffer.data).shape[-1] == 2
