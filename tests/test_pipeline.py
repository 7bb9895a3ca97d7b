"""Pipeline/parse_launch tests (modeled on the reference's
tests/check/pipelines/ and gstutils link tests)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make, list_factories
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import Pipeline, link


class TestRegistry:
    def test_factories_exist(self):
        facs = list_factories()
        for f in ("videotestsrc", "videoconvert", "videoscale", "capsfilter",
                  "identity", "fakesink", "appsink", "appsrc", "queue", "tee"):
            assert f in facs

    def test_make_with_props(self):
        e = element_factory_make("videotestsrc", pattern="snow",
                                 **{"num-buffers": 5})
        assert e.get_property("pattern") == "snow"
        assert e.get_property("num-buffers") == 5

    def test_bad_property(self):
        with pytest.raises(ValueError):
            element_factory_make("identity", nosuch=1)


class TestNegotiation:
    def test_simple_chain(self):
        p = Pipeline()
        src = element_factory_make("videotestsrc", **{"num-buffers": 2})
        conv = element_factory_make("videoconvert")
        sink = element_factory_make("fakesink")
        p.add(src, conv, sink)
        link(src, conv)
        link(conv, sink)
        p.negotiate()
        assert src.src_pads()[0].caps.is_fixed()
        s = src.src_pads()[0].caps[0]
        assert s["width"] == 320 and s["height"] == 240

    def test_capsfilter_forces_format(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 ! videoconvert ! "
            "video/x-raw,format=RGB,width=320,height=240 ! fakesink")
        p.negotiate()
        conv = [e for e in p.iterate_elements()
                if e.FACTORY == "videoconvert"][0]
        assert conv.src_pads()[0].caps[0]["format"] == "RGB"


class TestRun:
    def test_videotestsrc_to_appsink(self):
        p = parse_launch(
            "videotestsrc num-buffers=3 pattern=smpte75 ! videoconvert ! "
            "video/x-raw,format=RGB,width=320,height=240 ! appsink name=out")
        sink = p.get_by_name("out")
        p.run()
        assert p.bus.pop_filtered("eos") is not None
        samples = []
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            samples.append(s)
        assert sum(s.buffer.batch for s in samples) == 3
        arr = np.asarray(samples[0].buffer.data[0])
        assert arr.shape[-3:] == (240, 320, 1) or arr.shape[-2:] == (240, 320)

    def test_convert_scale_chain(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 ! videoconvert ! videoscale ! "
            "video/x-raw,format=RGB,width=64,height=48 ! fakesink name=sink")
        sink = p.get_by_name("sink")
        p.run()
        assert sink.n_rendered == 2
        r = np.asarray(sink.last_buffer.data[0])
        assert r.shape[-2:] == (48, 64)

    def test_num_buffers_eos(self):
        p = parse_launch("videotestsrc num-buffers=5 ! fakesink name=s")
        p.run()
        assert p.get_by_name("s").n_rendered == 5
        assert p.bus.pop_filtered("eos") is not None

    def test_batched_ticks(self):
        p = parse_launch("videotestsrc num-buffers=8 ! fakesink name=s",
                         batch=4)
        p.run()
        assert p.get_by_name("s").n_rendered == 8

    def test_timestamps(self):
        p = parse_launch("videotestsrc num-buffers=3 ! appsink name=out")
        sink = p.get_by_name("out")
        p.run()
        pts = [sink.pull_sample().buffer.pts for _ in range(3)]
        assert pts == [0, 33333333, 66666666]

    def test_appsrc_pipeline(self):
        p = parse_launch(
            "appsrc name=in caps=video/x-raw,format=RGB,width=4,height=4 ! "
            "videoconvert ! video/x-raw,format=BGR ! appsink name=out")
        src = p.get_by_name("in")
        rgb = (np.arange(4 * 4 * 3) % 256).astype(np.uint8).reshape(1, 4, 4, 3)
        planes = (rgb[..., 0], rgb[..., 1], rgb[..., 2])
        src.push_buffer(Buffer(data=planes, pts=0, batch=1))
        p.run()
        s = p.get_by_name("out").pull_sample()
        b = np.asarray(s.buffer.data[2])   # B plane comes first in BGR? no:
        # planes are component-ordered (R, G, B) regardless of layout
        np.testing.assert_array_equal(np.asarray(s.buffer.data[0]), rgb[..., 0])

    def test_snow_runs(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 pattern=snow ! appsink name=out")
        sink = p.get_by_name("out")
        p.run()
        a = np.asarray(sink.pull_sample().buffer.data[0])
        b = np.asarray(sink.pull_sample().buffer.data[0])
        # successive snow frames must differ (LCG advances across frames)
        assert not np.array_equal(a, b)

    def test_tee_two_sinks(self):
        p = parse_launch(
            "videotestsrc num-buffers=2 ! tee name=t "
            "t. ! queue ! fakesink name=a t. ! queue ! fakesink name=b")
        p.run()
        assert p.get_by_name("a").n_rendered == 2
        assert p.get_by_name("b").n_rendered == 2


class TestParse:
    def test_parse_errors(self):
        with pytest.raises(Exception):
            parse_launch("nosuchelement ! fakesink")
        with pytest.raises(Exception):
            parse_launch("videotestsrc !")

    def test_named_ref_requires_existing(self):
        with pytest.raises(Exception):
            parse_launch("foo. ! fakesink")
