"""switchbin / autoconvert / autovideoconvert (reference
gst-plugins-bad/gst/switchbin/, gst/autoconvert/)."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


def _pull_all(p, name="out"):
    sink = p.get_by_name(name)
    out = []
    while (s := sink.pull_sample()) is not None:
        out.append(s)
    return out


class TestSwitchBin:
    def test_selects_matching_path(self):
        p = parse_launch(
            'audiotestsrc num-buffers=3 samplesperbuffer=400 ! '
            'audio/x-raw,format=F32LE,rate=8000,channels=1 ! '
            'switchbin paths="video/x-raw->videoflip|'
            'audio/x-raw->volume,volume=0.5|ANY->" ! appsink name=out')
        p.run()
        sb = [e for e in p.elements if e.FACTORY == "switchbin"][0]
        assert sb.props["current-path"] == 1
        got = np.concatenate([np.asarray(s.buffer.data)
                              for s in _pull_all(p)])
        g = parse_launch(
            'audiotestsrc num-buffers=3 samplesperbuffer=400 ! '
            'audio/x-raw,format=F32LE,rate=8000,channels=1 ! '
            'volume volume=0.5 ! appsink name=out')
        g.run()
        want = np.concatenate([np.asarray(s.buffer.data)
                               for s in _pull_all(g)])
        np.testing.assert_array_equal(got, want)

    def test_passthrough_path(self):
        p = parse_launch(
            'videotestsrc num-buffers=2 ! '
            'video/x-raw,format=RGB,width=16,height=16 ! '
            'switchbin paths="audio/x-raw->volume|ANY->" ! '
            'appsink name=out')
        p.run()
        samples = _pull_all(p)
        assert samples
        sb = [e for e in p.elements if e.FACTORY == "switchbin"][0]
        assert sb.props["current-path"] == 1

    def test_no_matching_path_raises(self):
        p = parse_launch(
            'videotestsrc num-buffers=1 ! '
            'video/x-raw,format=RGB,width=8,height=8 ! '
            'switchbin paths="audio/x-raw->volume" ! appsink name=out')
        with pytest.raises(Exception):
            p.run()

    def test_host_inner_element(self):
        # a HOST inner element (rganalysis-style law encoder) works
        p = parse_launch(
            'audiotestsrc num-buffers=2 samplesperbuffer=300 ! '
            'audio/x-raw,format=S16LE,rate=8000,channels=1 ! '
            'switchbin paths="audio/x-raw->mulawenc" ! '
            'appsink name=out')
        p.run()
        samples = _pull_all(p)
        assert samples
        assert samples[0].caps[0].name == "audio/x-mulaw"


class TestAutoConvert:
    def test_picks_capable_factory(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 ! "
            "video/x-raw,format=I420,width=32,height=24 ! "
            "autoconvert factories=videoconvert ! "
            "video/x-raw,format=RGB ! appsink name=out")
        p.run()
        s = _pull_all(p)[0]
        assert s.caps[0]["format"] == "RGB"

    def test_skips_incompatible(self):
        p = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=200 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "autoconvert factories=videoflip,mulawenc ! "
            "appsink name=out")
        p.run()
        s = _pull_all(p)[0]
        assert s.caps[0].name == "audio/x-mulaw"

    def test_autovideoconvert(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 ! "
            "video/x-raw,format=UYVY,width=32,height=24 ! "
            "autovideoconvert ! video/x-raw,format=BGR ! "
            "appsink name=out")
        p.run()
        s = _pull_all(p)[0]
        assert s.caps[0]["format"] == "BGR"
