"""Integration corpus — the gst-integration-testsuites analog.

For every container/codec the framework can WRITE, this module
generates a small media file, then pins three layers of expectations:

1. typefind reports the right media type (gsttypefindfunctions.c
   parity sweep);
2. the discoverer extracts the expected media_info (the testsuites'
   expected-media_info files, reduced to the load-bearing fields);
3. a decode pipeline runs to EOS under the gst-validate
   PipelineMonitor with zero protocol violations.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import audio_oracle as ao  # noqa: E402

from gstreamer_tpu.core.parse import parse_launch  # noqa: E402
from gstreamer_tpu.utils.discoverer import Discoverer  # noqa: E402
from gstreamer_tpu.utils.typefind import type_find_file  # noqa: E402
from gstreamer_tpu.validate.monitor import PipelineMonitor  # noqa: E402

_AUDIO_SRC = ("audiotestsrc wave=sine freq=440 num-buffers=10 "
              "samplesperbuffer=1024 ! "
              "audio/x-raw,format=S16LE,rate=44100,channels=2 ! ")
_VIDEO_SRC = ("videotestsrc num-buffers=6 pattern=gradient ! "
              "video/x-raw,format=I420,width=64,height=48,"
              "framerate=30/1 ! ")

# (name, writer launch (format with path), expected typefind prefix,
#  decode launch (format with path))
CORPUS = [
    ("tone.wav", _AUDIO_SRC + "wavenc location={p}",
     "audio/x-wav", "wavparse location={p} ! appsink name=out"),
    ("tone.flac", _AUDIO_SRC + "flacenc location={p}",
     "audio/x-flac", "flacdec location={p} ! appsink name=out"),
    ("tone.oga", _AUDIO_SRC + "oggmux location={p}",
     "audio/ogg", "oggdemux location={p} ! appsink name=out"),
    ("tone.aiff", _AUDIO_SRC.replace("S16LE", "S16BE")
     + "aiffmux location={p}",
     "audio/x-aiff", "aiffparse location={p} ! appsink name=out"),
    ("tone.au", _AUDIO_SRC.replace("S16LE", "S16BE")
     + "auenc location={p}",
     "audio/x-au", "auparse location={p} ! appsink name=out"),
    ("vorbis.ogg",
     _AUDIO_SRC.replace("S16LE", "F32LE") + "vorbisenc location={p}",
     "audio/ogg", "oggdemux location={p} ! appsink name=out"),
    ("tone.opus",
     "audiotestsrc wave=sine freq=440 num-buffers=10 "
     "samplesperbuffer=960 ! "
     "audio/x-raw,format=F32LE,rate=48000,channels=1 ! "
     "opusenc location={p}",
     "audio/ogg", "opusdec location={p} ! appsink name=out"),
    ("frames.y4m", _VIDEO_SRC + "y4menc location={p}",
     "application/x-yuv4mpeg",
     "y4mdec location={p} ! appsink name=out"),
    ("video.avi",
     "avimux name=m location={p} ! fakesink " + _VIDEO_SRC + "m.video_0",
     "video/x-msvideo",
     "avidemux location={p} stream=video ! appsink name=out"),
    ("video.mkv",
     "matroskamux name=m location={p} ! fakesink "
     + _VIDEO_SRC + "m.video_0",
     "video/x-matroska",
     "matroskademux location={p} stream=video ! appsink name=out"),
    ("video.mp4",
     _VIDEO_SRC.replace("I420", "UYVY") + "qtmux location={p}",
     "video/quicktime",
     "qtdemux location={p} stream=video ! appsink name=out"),
    ("video.ogv",
     _VIDEO_SRC + "theoraenc location={p} quality=55",
     "video/ogg",
     "theoradec location={p} ! appsink name=out"),
    ("video.mxf",
     "mxfmux name=m location={p} ! fakesink "
     + _VIDEO_SRC.replace("I420", "UYVY") + "m.video_0",
     "application/mxf",
     "mxfdemux location={p} stream=video ! appsink name=out"),
]


def _generate(tmp_path, name, writer):
    path = tmp_path / name
    p = parse_launch(writer.format(p=path))
    p.run()
    p.set_state("null")
    assert path.exists() and path.stat().st_size > 0, name
    return path


class TestCorpus:
    @pytest.mark.parametrize(
        "name,writer,expect_type,decoder",
        CORPUS, ids=[c[0] for c in CORPUS])
    def test_roundtrip(self, tmp_path, name, writer, expect_type,
                       decoder):
        path = _generate(tmp_path, name, writer)

        media, prob = type_find_file(str(path))
        assert media.split(",")[0].strip() == expect_type, \
            f"typefind({name}) = {media}"
        assert prob >= 50

        # decode to EOS under validate monitors: zero violations
        p = parse_launch(decoder.format(p=path))
        mon = PipelineMonitor(p)
        try:
            p.run()
            sink = p.get_by_name("out")
            got = 0
            while sink.pull_sample() is not None:
                got += 1
            assert got > 0, f"{name}: decoded nothing"
            assert mon.ok, f"{name}: {mon.report()}"
        finally:
            mon.uninstall() if hasattr(mon, "uninstall") else None
            p.set_state("null")


class TestDiscovererInfo:
    """Pinned media_info (expected-media_info analog)."""

    def test_wav_info(self, tmp_path):
        path = _generate(tmp_path, "i.wav",
                         CORPUS[0][1])
        info = Discoverer().discover(str(path))
        a = info.audio_streams[0]
        assert a.rate == 44100 and a.channels == 2
        assert abs(info.duration_ns - 10 * 1024 / 44100 * 1e9) < 2e7

    def test_flac_info(self, tmp_path):
        path = _generate(tmp_path, "i.flac", CORPUS[1][1])
        info = Discoverer().discover(str(path))
        a = info.audio_streams[0]
        assert a.rate == 44100 and a.channels == 2

    def test_ogg_vorbis_info(self, tmp_path):
        path = _generate(tmp_path, "i.ogg", CORPUS[5][1])
        info = Discoverer().discover(str(path))
        assert info.audio_streams, "no audio stream found"

    def test_avi_info(self, tmp_path):
        path = _generate(tmp_path, "i.avi", CORPUS[8][1])
        info = Discoverer().discover(str(path))
        v = info.video_streams[0]
        assert (v.width, v.height) == (64, 48)

    def test_matroska_info(self, tmp_path):
        path = _generate(tmp_path, "i.mkv", CORPUS[9][1])
        info = Discoverer().discover(str(path))
        v = info.video_streams[0]
        assert (v.width, v.height) == (64, 48)

    def test_mp4_info(self, tmp_path):
        path = _generate(tmp_path, "i.mp4", CORPUS[10][1])
        info = Discoverer().discover(str(path))
        v = info.video_streams[0]
        assert (v.width, v.height) == (64, 48)

    @pytest.mark.skipif(not (ao.have_lame() and ao.have_mpg123()),
                        reason="lame/mpg123 missing")
    def test_mp3_info(self, tmp_path):
        t = np.arange(44100 // 2) / 44100.0
        pcm = (np.sin(2 * np.pi * 440 * t) * 16000).astype(np.int16)
        blob = ao.lame_encode(pcm[:, None], 44100, 128)
        path = tmp_path / "i.mp3"
        path.write_bytes(blob)
        media, _ = type_find_file(str(path))
        assert media.startswith("audio/mpeg")
        info = Discoverer().discover(str(path))
        a = info.audio_streams[0]
        assert a.rate == 44100


class TestScenarioGrammar:
    """gst-validate scenario actions over a corpus pipeline
    (gst-validate-scenario.h:97 action set: pause/play/flush/
    set-property/seek/stop)."""

    def test_pause_play_flush_under_monitor(self, tmp_path):
        from gstreamer_tpu.validate.monitor import Scenario

        path = _generate(tmp_path, "s.wav", CORPUS[0][1])
        p = parse_launch(
            f"wavparse location={path} ! volume name=v volume=1.0 ! "
            "appsink name=out")
        mon = PipelineMonitor(p)
        sc = Scenario(actions=[
            (1, Scenario.pause(2)),
            (2, Scenario.play()),
            (3, Scenario.set_property("v", "volume", 0.5)),
            (4, Scenario.flush()),
        ], max_ticks=50)
        sc.run(p, monitor=mon)
        assert mon.ok, mon.report()
        sink = p.get_by_name("out")
        assert sink.pull_sample() is not None

    def test_stop_action(self, tmp_path):
        from gstreamer_tpu.validate.monitor import Scenario

        path = _generate(tmp_path, "s2.wav", CORPUS[0][1])
        p = parse_launch(f"wavparse location={path} ! fakesink")
        mon = PipelineMonitor(p)
        Scenario(actions=[(2, Scenario.stop())], max_ticks=50).run(
            p, monitor=mon)
        assert mon.ok, mon.report()
