"""subparse (SRT/WebVTT) + wavenc roundtrip."""

import numpy as np

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
