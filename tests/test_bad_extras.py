"""bad_extras: subtitle encoders, audiochannelmix, debug sinks,
roundrobin, legacy raw parsers, autovideoflip
(gst-plugins-bad/gst/subenc, audiofxbad, debugutils, rawparse)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


class TestSubEnc:
    def test_srt_blocks(self, tmp_path):
        path = tmp_path / "s.srt"
        p = parse_launch(f"appsrc name=in ! text/x-raw ! srtenc "
                         f"location={path}")
        p.get_by_name("in").push_buffer(Buffer(
            data="First", pts=0, duration=1_000_000_000))
        p.get_by_name("in").push_buffer(Buffer(
            data="Second", pts=61_250_000_000, duration=500_000_000))
        p.get_by_name("in").end_of_stream()
        p.run()
        p.set_state("null")
        srt = path.read_text()
        assert "1\n00:00:00,000 --> 00:00:01,000\nFirst\n" in srt
        assert "2\n00:01:01,250 --> 00:01:01,750\nSecond\n" in srt

    def test_webvtt_header_and_dots(self, tmp_path):
        path = tmp_path / "s.vtt"
        p = parse_launch(f"appsrc name=in ! text/x-raw ! webvttenc "
                         f"location={path}")
        p.get_by_name("in").push_buffer(Buffer(
            data="Cue", pts=1_000_000_000, duration=2_000_000_000))
        p.get_by_name("in").end_of_stream()
        p.run()
        p.set_state("null")
        vtt = path.read_text()
        assert vtt.startswith("WEBVTT\n\n")
        assert "00:00:01.000 --> 00:00:03.000\nCue\n" in vtt

    def test_srt_roundtrip_subparse(self, tmp_path):
        path = tmp_path / "rt.srt"
        p = parse_launch(f"appsrc name=in ! text/x-raw ! srtenc "
                         f"location={path}")
        for k, text in enumerate(["alpha.", "beta."]):
            p.get_by_name("in").push_buffer(Buffer(
                data=text, pts=k * 2_000_000_000,
                duration=1_000_000_000))
        p.get_by_name("in").end_of_stream()
        p.run()
        p.set_state("null")
        d = parse_launch(f"appsrc name=in caps=application/"
                         f"octet-stream ! subparse ! appsink name=out")
        d.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(path.read_bytes(), np.uint8), batch=1))
        d.get_by_name("in").end_of_stream()
        d.run()
        texts = []
        while (s := d.get_by_name("out").pull_sample()) is not None:
            dd = s.buffer.data
            texts.extend(dd if isinstance(dd, (list, tuple)) else [dd])
        assert texts == ["alpha.", "beta."]


class TestAudioChannelMix:
    def test_swap_channels(self):
        p = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=300 ! "
            "audio/x-raw,format=F32LE,rate=8000,channels=2 ! "
            "audiochannelmix left-to-left=0.0 left-to-right=1.0 "
            "right-to-left=1.0 right-to-right=0.0 ! appsink name=out")
        p.run()
        g = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=300 ! "
            "audio/x-raw,format=F32LE,rate=8000,channels=2 ! "
            "appsink name=out")
        g.run()
        a = np.concatenate([np.asarray(s.buffer.data) for s in
                            iter(lambda: p.get_by_name("out")
                                 .pull_sample(), None)])
        b = np.concatenate([np.asarray(s.buffer.data) for s in
                            iter(lambda: g.get_by_name("out")
                                 .pull_sample(), None)])
        np.testing.assert_allclose(a[:, 0], b[:, 1], rtol=1e-6)
        np.testing.assert_allclose(a[:, 1], b[:, 0], rtol=1e-6)

    def test_mono_downmix_style(self):
        p = parse_launch(
            "audiotestsrc num-buffers=1 samplesperbuffer=200 ! "
            "audio/x-raw,format=F32LE,rate=8000,channels=2 ! "
            "audiochannelmix left-to-left=0.5 left-to-right=0.5 "
            "right-to-left=0.5 right-to-right=0.5 ! appsink name=out")
        p.run()
        a = np.asarray(p.get_by_name("out").pull_sample().buffer.data)
        np.testing.assert_allclose(a[:, 0], a[:, 1], rtol=1e-6)


class TestDebugSinks:
    def test_checksumsink(self):
        p = parse_launch(
            "audiotestsrc num-buffers=3 samplesperbuffer=100 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "checksumsink name=cs")
        p.run()
        cs = p.get_by_name("cs")
        assert len(cs.checksums) == 3
        assert all(len(c) == 40 for c in cs.checksums)   # sha1

    def test_videocodectestsink(self, tmp_path):
        p = parse_launch(
            f"videotestsrc num-buffers=2 ! video/x-raw,format=I420,"
            f"width=16,height=16 ! videocodectestsink name=v "
            f"location={tmp_path}/dump.yuv")
        p.run()
        v = p.get_by_name("v")
        assert len(v.checksums) == 2
        dump = (tmp_path / "dump.yuv").read_bytes()
        assert len(dump) == 2 * (16 * 16 + 2 * 8 * 8)

    def test_fpsdisplaysink(self):
        p = parse_launch(
            "videotestsrc num-buffers=7 ! video/x-raw,format=RGB,"
            "width=8,height=8 ! fpsdisplaysink name=f")
        p.run()
        assert p.get_by_name("f").frames_rendered == 7

    def test_debugspy_messages(self):
        p = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=100 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "debugspy ! fakesink")
        p.run()
        msgs = [m for m in iter(lambda: p.bus.pop(), None)
                if m.type == "element"
                and m.data.get("name") == "GstDebugSpy"]
        assert len(msgs) == 2

    def test_chopmydata_preserves_content(self):
        p = parse_launch(
            "audiotestsrc num-buffers=3 samplesperbuffer=499 wave=saw "
            "! audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "tee name=t t. ! testsink name=a "
            "t. ! chopmydata min-size=10 max-size=100 ! testsink "
            "name=b")
        p.run()
        assert p.get_by_name("a").md5 == p.get_by_name("b").md5


class TestRoundRobin:
    def test_distributes(self):
        p = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=100 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "roundrobin name=rr rr.src_0 ! appsink name=a "
            "rr.src_1 ! appsink name=b")
        p.run()
        na = sum(1 for _ in iter(
            lambda: p.get_by_name("a").pull_sample(), None))
        nb = sum(1 for _ in iter(
            lambda: p.get_by_name("b").pull_sample(), None))
        assert na == 2 and nb == 2


class TestLegacyRawParse:
    def test_videoparse_alias(self):
        p = parse_launch(
            "appsrc name=in ! application/octet-stream ! videoparse "
            "width=8 height=8 format=GRAY8 ! appsink name=out")
        p.get_by_name("in").push_buffer(Buffer(
            data=np.arange(128, dtype=np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        frames = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            frames += s.buffer.batch or 1
        assert frames == 2


class TestAutoVideoFlip:
    def test_default_passthrough(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 ! video/x-raw,format=I420,"
            "width=32,height=24 ! autovideoflip ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert (s.caps[0]["width"], s.caps[0]["height"]) == (32, 24)
