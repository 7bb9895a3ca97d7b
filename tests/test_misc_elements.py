"""autovideosrc/autoaudiosrc resolution, videoanalyse messages,
audiomixmatrix, audiobuffersplit."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


def _msgs(p, name):
    out = []
    while (m := p.bus.pop()) is not None:
        if m.type == "element" and m.data.get("name") == name:
            out.append(m)
    return out


class TestAutoSources:
    def test_autovideosrc_is_videotestsrc(self):
        p = parse_launch("autovideosrc num-buffers=2 ! "
                         "video/x-raw,format=I420,width=32,height=24 ! "
                         "appsink name=out")
        p.run()
        assert any(e.FACTORY == "videotestsrc" for e in p.elements)
        assert p.get_by_name("out").pull_sample() is not None

    def test_autoaudiosrc_is_audiotestsrc(self):
        p = parse_launch("autoaudiosrc num-buffers=2 ! appsink name=out")
        p.run()
        assert any(e.FACTORY == "audiotestsrc" for e in p.elements)


class TestVideoAnalyse:
    def test_luma_stats(self):
        p = parse_launch(
            "videotestsrc num-buffers=3 pattern=white ! "
            "video/x-raw,format=I420,width=32,height=24 ! "
            "videoanalyse ! fakesink")
        p.run()
        msgs = _msgs(p, "GstVideoAnalyse")
        assert len(msgs) == 3
        for m in msgs:
            # white = Y 235 -> 235/255
            assert m.data["luma-average"] == pytest.approx(235 / 255)
            assert m.data["luma-variance"] == pytest.approx(0.0, abs=1e-9)

    def test_variance_nonzero_for_pattern(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 pattern=smpte ! "
            "video/x-raw,format=I420,width=64,height=48 ! "
            "videoanalyse ! fakesink")
        p.run()
        m = _msgs(p, "GstVideoAnalyse")[0]
        assert m.data["luma-variance"] > 0.01


class TestAudioMixMatrix:
    def _run(self, x, desc):
        p = parse_launch(
            f"appsrc name=in ! audio/x-raw,format=F64LE,rate=8000,"
            f"channels={x.shape[1]} ! {desc} ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=x))
        p.get_by_name("in").end_of_stream()
        p.run()
        return np.asarray(p.get_by_name("out").pull_sample().buffer.data)

    def test_manual_matrix(self):
        x = np.array([[1.0, 2.0], [3.0, 4.0]])
        el_desc = "audiomixmatrix in-channels=2 out-channels=2"
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=F64LE,rate=8000,"
            "channels=2 ! audiomixmatrix name=mm in-channels=2 "
            "out-channels=2 ! appsink name=out")
        mm = p.get_by_name("mm")
        mm.props["matrix"] = [[0.5, 0.5], [1.0, 0.0]]
        p.get_by_name("in").push_buffer(Buffer(data=x))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample().buffer.data)
        np.testing.assert_allclose(got, x @ np.array(
            [[0.5, 0.5], [1.0, 0.0]]).T)

    def test_first_channels_mode_downmix(self):
        x = np.arange(12, dtype=np.float64).reshape(4, 3)
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=F64LE,rate=8000,"
            "channels=3 ! audiomixmatrix mode=first-channels ! "
            "audio/x-raw,channels=2 ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=x))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample().buffer.data)
        np.testing.assert_array_equal(got, x[:, :2])


class TestAudioBufferSplit:
    def test_exact_chunks(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1000, 2))
        p = parse_launch(
            "appsrc name=in ! audio/x-raw,format=F64LE,rate=8000,"
            "channels=2 ! audiobuffersplit "
            "output-buffer-duration=1/50 ! appsink name=out")
        src = p.get_by_name("in")
        for i in range(0, 1000, 70):        # ragged input chunks
            src.push_buffer(Buffer(data=x[i:i + 70]))
        src.end_of_stream()
        p.run()
        outs = []
        sink = p.get_by_name("out")
        while (s := sink.pull_sample()) is not None:
            outs.append(np.asarray(s.buffer.data))
        # 8000/50 = 160-sample chunks; 1000 = 6x160 + 40 tail
        got = np.concatenate(outs, axis=0)
        np.testing.assert_array_equal(got, x)
        sizes = [len(o) for o in outs]
        assert all(s % 160 == 0 for s in sizes[:-1])
        assert sizes[-1] % 160 == 40 % 160 or sizes[-1] % 160 == 0
