"""asfmux/asfparse reduced (gst-plugins-bad/gst/asfmux/)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.asf import (GUID_DATA, GUID_HEADER,
                                        GUID_STREAM_PROPS)


class TestAsf:
    def test_header_structure(self, tmp_path):
        path = tmp_path / "s.asf"
        p = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=400 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"asfmux location={path}")
        p.run()
        p.set_state("null")
        blob = path.read_bytes()
        assert blob[:16] == GUID_HEADER
        assert GUID_STREAM_PROPS in blob
        assert GUID_DATA in blob
        hdr_size = struct.unpack("<Q", blob[16:24])[0]
        assert blob[hdr_size:hdr_size + 16] == GUID_DATA

    def test_audio_bit_exact(self, tmp_path):
        path = tmp_path / "a.asf"
        p = parse_launch(
            f"audiotestsrc num-buffers=3 samplesperbuffer=500 "
            f"wave=saw ! audio/x-raw,format=S16LE,rate=16000,"
            f"channels=2 ! asfmux location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"asfparse location={path} stream=audio ! "
                         f"appsink name=out")
        d.run()
        got = np.concatenate(
            [np.asarray(s.buffer.data) for s in
             iter(lambda: d.get_by_name("out").pull_sample(), None)])
        gold = parse_launch(
            "audiotestsrc num-buffers=3 samplesperbuffer=500 "
            "wave=saw ! audio/x-raw,format=S16LE,rate=16000,"
            "channels=2 ! appsink name=out")
        gold.run()
        want = np.concatenate(
            [np.asarray(s.buffer.data) for s in
             iter(lambda: gold.get_by_name("out").pull_sample(),
                  None)])
        np.testing.assert_array_equal(got, want)

    def test_av_roundtrip(self, tmp_path):
        path = tmp_path / "av.asf"
        p = parse_launch(
            f"asfmux name=m location={path} "
            f"videotestsrc num-buffers=5 ! video/x-raw,format=I420,"
            f"width=48,height=32,framerate=10/1 ! jpegenc ! "
            f"m.video_0 "
            f"audiotestsrc num-buffers=5 samplesperbuffer=800 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"m.audio_0")
        p.run()
        p.set_state("null")
        dv = parse_launch(f"asfparse location={path} stream=video ! "
                          f"jpegdec ! appsink name=out")
        dv.run()
        frames = sum((s.buffer.batch or 1) for s in
                     iter(lambda: dv.get_by_name("out").pull_sample(),
                          None))
        assert frames == 5
        da = parse_launch(f"asfparse location={path} stream=audio ! "
                          f"appsink name=out")
        da.run()
        tot = sum(np.asarray(s.buffer.data).shape[0] for s in
                  iter(lambda: da.get_by_name("out").pull_sample(),
                       None))
        assert tot == 4000

    def test_caps_recovered(self, tmp_path):
        path = tmp_path / "c.asf"
        p = parse_launch(
            f"videotestsrc num-buffers=1 ! video/x-raw,format=I420,"
            f"width=96,height=64,framerate=5/1 ! jpegenc ! "
            f"asfmux location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"asfparse location={path} ! appsink "
                         f"name=out")
        d.run()
        s = d.get_by_name("out").pull_sample()
        assert s.caps[0].name == "image/jpeg"
        assert s.caps[0]["width"] == 96

    def test_rejects_garbage(self, tmp_path):
        path = tmp_path / "bad.asf"
        path.write_bytes(b"\x00" * 128)
        d = parse_launch(f"asfparse location={path} stream=audio ! "
                         f"fakesink")
        with pytest.raises(Exception):
            d.run()
