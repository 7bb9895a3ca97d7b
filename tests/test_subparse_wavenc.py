"""subparse (SRT/WebVTT) + wavenc roundtrip."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.elements.subparse import parse_srt, parse_vtt

SRT = """1
00:00:01,000 --> 00:00:03,500
Hello there.

2
00:00:04,000 --> 00:00:06,000
Second line
over two rows.
"""

VTT = """WEBVTT

00:00:01.000 --> 00:00:03.500
Hello there.
"""


def test_parse_srt():
    cues = parse_srt(SRT)
    assert len(cues) == 2
    assert cues[0] == (1_000_000_000, 3_500_000_000, "Hello there.")
    assert cues[1][2] == "Second line\nover two rows."


def test_parse_vtt():
    cues = parse_vtt(VTT)
    assert cues[0][0] == 1_000_000_000


def test_subparse_element():
    p = parse_launch("appsrc name=in caps=application/octet-stream ! "
                     "subparse ! appsink name=s")
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(SRT.encode(), np.uint8), batch=1))
    p.set_state(State.PLAYING)
    assert p.tick()
    s = p.get_by_name("s").pull_sample()
    assert s.buffer.batch == 2
    assert s.buffer.pts == 1_000_000_000
    assert s.buffer.data[0] == "Hello there."


def test_wavenc_roundtrip(tmp_path):
    out = str(tmp_path / "out.wav")
    p = parse_launch(
        "audiotestsrc num-buffers=4 samplesperbuffer=480 wave=sine ! "
        "audio/x-raw,format=S16LE,rate=48000,channels=2 ! "
        f"wavenc location={out}")
    p.set_state(State.PLAYING)
    p.run()
    # decode with our own wavparse path via filesrc
    q = parse_launch(f"wavparse location={out} ! appsink name=s")
    q.set_state(State.PLAYING)
    q.run()
    sink = q.get_by_name("s")
    total = 0
    while len(sink):
        total += np.asarray(sink.pull_sample().buffer.data).shape[0]
    assert total == 4 * 480


def test_encodebin_wav_profile(tmp_path):
    out = str(tmp_path / "enc.wav")
    p = parse_launch(
        "audiotestsrc num-buffers=2 samplesperbuffer=480 ! "
        "audio/x-raw,format=S16LE,rate=48000,channels=1 ! "
        f"encodebin profile=audio/x-wav location={out}")
    p.set_state(State.PLAYING)
    p.run()
    q = parse_launch(f"wavparse location={out} ! appsink name=s")
    q.set_state(State.PLAYING)
    q.run()
    sink = q.get_by_name("s")
    total = 0
    while len(sink):
        total += np.asarray(sink.pull_sample().buffer.data).shape[0]
    assert total == 960


class TestAllSubtitleFormats:
    """The full gstsubparse.c format family: autodetection + parse."""

    SAMPLES = {
        "microdvd": "{1}{1}25.0\n{25}{50}Hello|World\n{75}{100}Bye",
        "mpl2": "[10][30]line one|line two\n[40][60]next",
        "tmplayer": "0:00:01:First line\n0:00:03:Second\n",
        "sami": "<SAMI><BODY><SYNC Start=1000><P>Hi</P>"
                "<SYNC Start=3000><P>&nbsp;</P></BODY></SAMI>",
        "subviewer": "[INFORMATION]\n[TITLE]x\n\n"
                     "00:00:01.00,00:00:03.00\nHello[br]World\n\n"
                     "00:00:04.00,00:00:06.00\nNext\n",
        "mpsub": "FORMAT=TIME\n\n1.0 2.0\nfirst cue\n\n1.5 1.0\n"
                 "second\n",
        "lrc": "[00:05.00]first lyric\n[00:10.50]second lyric\n",
        "qttext": "{QTtext}{font:Arial}\n[00:00:01.00]\nHello QT\n"
                  "[00:00:03.00]\n",
        "dks": "[0:00:02]hello dks\n[0:00:04]next\n",
        "srt": "1\n00:00:01,000 --> 00:00:02,000\nSRT line\n",
        "vtt": "WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nVTT line\n",
    }

    @pytest.mark.parametrize("fmt", sorted(SAMPLES))
    def test_detect_and_parse(self, fmt):
        from gstreamer_tpu.elements.subparse import (_SUB_PARSERS,
                                                     detect_sub_format)
        text = self.SAMPLES[fmt]
        assert detect_sub_format(text) == fmt
        cues = _SUB_PARSERS[fmt](text)
        assert cues and all(e > s for s, e, _ in cues)
        assert all(t for _, _, t in cues)

    def test_microdvd_fps_override(self):
        from gstreamer_tpu.elements.subparse import parse_microdvd
        cues = parse_microdvd("{1}{1}25.0\n{25}{50}X")
        assert cues[0][0] == 1_000_000_000
        cues = parse_microdvd("{24}{48}X")     # default 23.976
        assert abs(cues[0][0] - 1_001_000_000) < 2_000_000

    def test_mpsub_relative_timing(self):
        from gstreamer_tpu.elements.subparse import parse_mpsub
        cues = parse_mpsub(
            "FORMAT=TIME\n\n1.0 2.0\na\n\n1.5 1.0\nb\n")
        assert cues[0][:2] == (1_000_000_000, 3_000_000_000)
        assert cues[1][:2] == (4_500_000_000, 5_500_000_000)

    def test_element_autodetects_microdvd(self):
        from gstreamer_tpu.core.buffer import Buffer
        p = parse_launch("appsrc name=in ! application/octet-stream ! "
                         "subparse ! appsink name=out")
        blob = b"{1}{1}25.0\n{25}{50}Hello\n{75}{100}World\n"
        p.get_by_name("in").push_buffer(Buffer(
            data=np.frombuffer(blob, np.uint8), pts=0))
        p.get_by_name("in").end_of_stream()
        p.run()
        s = p.get_by_name("out").pull_sample()
        assert s is not None
        assert s.buffer.pts == 1_000_000_000
