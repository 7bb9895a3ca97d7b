"""dsdconvert element + fakevideodec
(gst-plugins-base/gst/dsd/gstdsdconvert.c)."""

import numpy as np
import pytest

from gstreamer_tpu.audio.dsd import dsd_convert
from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


class TestDsdConvert:
    @pytest.mark.parametrize("ofmt", ["U16LE", "U16BE", "U32LE",
                                      "U32BE"])
    def test_matches_dsd_convert(self, ofmt):
        data = np.arange(128, dtype=np.uint8)
        p = parse_launch(
            f"appsrc name=in ! audio/x-dsd,format=U8,rate=2822400,"
            f"channels=2,layout=interleaved ! dsdconvert ! "
            f"audio/x-dsd,format={ofmt} ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=data, pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample()
                         .buffer.data).ravel()
        want = dsd_convert(data, "U8", ofmt, 2)
        np.testing.assert_array_equal(got, want)

    def test_roundtrip_identity(self):
        data = np.random.default_rng(0).integers(
            0, 256, 256, dtype=np.int64).astype(np.uint8)
        p = parse_launch(
            "appsrc name=in ! audio/x-dsd,format=U8,rate=2822400,"
            "channels=2,layout=interleaved ! dsdconvert ! "
            "audio/x-dsd,format=U32BE ! dsdconvert ! "
            "audio/x-dsd,format=U8 ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(data=data, pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        got = np.asarray(p.get_by_name("out").pull_sample()
                         .buffer.data).ravel()
        np.testing.assert_array_equal(got, data)


class TestFakeVideoDec:
    def test_emits_gray_frames(self):
        p = parse_launch(
            "appsrc name=in ! video/x-fake,width=32,height=24,"
            "framerate=10/1 ! fakevideodec ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.zeros(10, np.uint8), pts=0, batch=1))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        y, u, v = [np.asarray(x) for x in s.buffer.data]
        assert y.shape[-2:] == (24, 32)
        assert (y == 128).all() and (u == 128).all()
        assert s.caps[0]["format"] == "I420"
