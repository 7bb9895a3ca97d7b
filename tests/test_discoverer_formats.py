"""Discoverer over the framework's container formats (pbutils
gstdiscoverer.c equivalent)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.utils.discoverer import Discoverer


class TestDiscoverer:
    def test_mov(self, tmp_path):
        path = tmp_path / "a.mov"
        p = parse_launch(
            f"videotestsrc num-buffers=10 ! video/x-raw,format=UYVY,"
            f"width=64,height=48,framerate=10/1 ! qtmux "
            f"location={path}")
        p.run()
        p.set_state("null")
        info = Discoverer().discover(str(path))
        vs = info.video_streams
        assert len(vs) == 1
        assert vs[0].width == 64 and vs[0].height == 48
        assert vs[0].format == "2vuy"
        assert abs(info.duration_ns - 1_000_000_000) < 150_000_000

    def test_avi(self, tmp_path):
        path = tmp_path / "a.avi"
        p = parse_launch(
            f"videotestsrc num-buffers=5 ! video/x-raw,format=I420,"
            f"width=32,height=24,framerate=5/1 ! avimux "
            f"location={path}")
        p.run()
        p.set_state("null")
        info = Discoverer().discover(str(path))
        vs = info.video_streams
        assert vs[0].width == 32 and vs[0].fps.num == 5
        assert info.duration_ns == 1_000_000_000

    def test_matroska(self, tmp_path):
        path = tmp_path / "a.mkv"
        p = parse_launch(
            f"videotestsrc num-buffers=4 ! video/x-raw,format=I420,"
            f"width=32,height=24,framerate=10/1 ! matroskamux "
            f"location={path}")
        p.run()
        p.set_state("null")
        info = Discoverer().discover(str(path))
        vs = info.video_streams
        assert vs[0].width == 32
        assert vs[0].format == "V_UNCOMPRESSED"

    def test_flac(self, tmp_path):
        path = tmp_path / "a.flac"
        p = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=1000 ! "
            f"audio/x-raw,format=S16LE,rate=16000,channels=2 ! "
            f"flacenc location={path}")
        p.run()
        p.set_state("null")
        info = Discoverer().discover(str(path))
        au = info.audio_streams[0]
        assert au.rate == 16000 and au.channels == 2
        assert info.duration_ns == 4000 * 1_000_000_000 // 16000

    def test_wav_still_works(self, tmp_path):
        path = tmp_path / "a.wav"
        p = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=8000 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"wavenc location={path}")
        p.run()
        p.set_state("null")
        info = Discoverer().discover(str(path))
        au = info.audio_streams[0]
        assert au.rate == 8000 and info.duration_ns == 2_000_000_000
