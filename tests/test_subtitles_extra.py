"""subtitleoverlay / ttmlparse / ttmlrender / avisubtitle / apev2mux /
bpmdetect / rtpdec (reference gst/playback/gstsubtitleoverlay.c,
ext/ttml/, gst/avi/gstavisubtitle.c, ext/taglib/gstapev2mux.cc,
ext/soundtouch/gstbpmdetect.cc)."""

import struct

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import (element_factory_make as make,
                                        factory_exists)
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.subtitles_extra import parse_ttml

TTML = b"""<?xml version="1.0" encoding="utf-8"?>
<tt xmlns="http://www.w3.org/ns/ttml">
 <body><div>
  <p begin="00:00:01.000" end="00:00:02.500">Hello TTML</p>
  <p begin="3.5s" end="5s">Second cue</p>
 </div></body></tt>"""


class TestTtml:
    def test_parse_ttml_times(self):
        cues = parse_ttml(TTML)
        assert [c["text"] for c in cues] == ["Hello TTML",
                                             "Second cue"]
        assert cues[0]["pts"] == 1_000_000_000
        assert cues[0]["duration"] == 1_500_000_000
        assert cues[1]["pts"] == 3_500_000_000

    def test_ttmlparse_element(self):
        p = parse_launch("appsrc name=in ! application/ttml+xml ! "
                         "ttmlparse ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(TTML, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        texts = [bytes(np.asarray(b).ravel()) for b in s.buffer.data]
        assert texts == [b"Hello TTML", b"Second cue"]
        assert s.buffer.pts == 1_000_000_000


class TestSubtitleOverlay:
    def test_text_modifies_video(self):
        desc = ("videotestsrc num-buffers=1 pattern=black ! "
                "video/x-raw,format=I420,width=160,height=120 ! "
                "subtitleoverlay name=o ! appsink name=out  "
                "appsrc name=txt ! text/x-raw,format=utf8 ! o.")
        p = parse_launch(desc)
        p.get_by_name("txt").push_buffer(Buffer(
            data=np.frombuffer(b"HELLO", np.uint8), pts=0))
        p.get_by_name("txt").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        y = np.asarray(s.buffer.data[0])
        assert y.max() > 100                     # glyphs rendered

    def test_ttmlrender(self):
        desc = ("videotestsrc num-buffers=1 pattern=black ! "
                "video/x-raw,format=I420,width=160,height=120 ! "
                "ttmlrender name=o ! appsink name=out  "
                "appsrc name=txt ! application/ttml+xml ! o.")
        p = parse_launch(desc)
        p.get_by_name("txt").push_buffer(Buffer(
            data=np.frombuffer(TTML, np.uint8), pts=0))
        p.get_by_name("txt").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        y = np.asarray(s.buffer.data[0])
        assert y.max() > 100


class TestAviSubtitle:
    def test_gab2_extraction(self):
        srt = b"1\n00:00:01,000 --> 00:00:02,000\nHi\n\n"
        name = "sub.srt".encode("utf-16-le")
        blob = (b"GAB2\x00"
                + struct.pack("<HI", 2, len(name)) + name
                + struct.pack("<HI", 4, len(srt)) + srt)
        p = parse_launch("appsrc name=in ! "
                         "application/x-subtitle-avi ! avisubtitle ! "
                         "appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(blob, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert bytes(np.asarray(s.buffer.data).ravel()) == srt


class TestApev2Mux:
    def test_prepends_tag(self):
        audio = b"\xff\xfbAUDIO" * 10
        p = parse_launch('appsrc name=in ! audio/mpeg ! '
                         'apev2mux tags=title=Test ! appsink name=out')
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(audio, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        out = bytearray()
        while (s := p.get_by_name("out").pull_sample()) is not None:
            out += bytes(np.asarray(s.buffer.data).ravel())
        assert out[:8] == b"APETAGEX"
        assert struct.unpack("<I", out[8:12])[0] == 2000
        assert b"Title\x00Test" in out
        assert bytes(out).endswith(audio)


class TestBpmDetect:
    def test_click_track_bpm(self):
        rate = 8000
        bpm = 120
        n = rate * 8
        x = np.zeros(n, np.float32)
        step = int(rate * 60 / bpm)
        for i in range(0, n, step):
            x[i:i + 200] = np.random.default_rng(1).standard_normal(
                min(200, n - i)).astype(np.float32)
        el = make("bpmdetect")
        el.set_info([{"rate": rate}] if False else None, None)
        el._rate = rate
        el.start()
        el.host_process(Buffer(data=x, pts=0))
        assert abs(el.bpm - bpm) < 8, el.bpm


class TestRtpDec:
    def test_registered_as_session(self):
        assert factory_exists("rtpdec")
        from gstreamer_tpu.net.rtpmanager import RtpBin
        assert isinstance(make("rtpdec"), RtpBin)
