"""MPEG Program Stream mux/demux (gst-plugins-bad/gst/mpegpsmux +
gst/mpegdemux): the DVD VOB codec family — MPEG-2 video, MPEG-1
layer-II audio, AC-3 on the 0xBD private-1 substream."""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.native import av as native_av

needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")

SRC_V = ("videotestsrc num-buffers=4 pattern=gradient ! "
         "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! ")


def _build(tmp_path):
    path = tmp_path / "av.mpg"
    p = parse_launch(
        f"mpegpsmux name=m location={path} "
        + SRC_V + "avenc_mpeg2video ! m.sink_0 "
        "audiotestsrc num-buffers=4 samplesperbuffer=4096 ! "
        "audio/x-raw,rate=44100,channels=2,format=S16LE ! "
        "twolamemp2enc ! m.sink_1 "
        "audiotestsrc num-buffers=4 samplesperbuffer=4096 ! "
        "avenc_ac3 ! m.sink_2")
    p.run()
    return path


def _pull_audio(p):
    sink = p.get_by_name("out")
    chunks = []
    while (s := sink.pull_sample()) is not None:
        chunks.append(np.asarray(s.buffer.data))
    return np.concatenate(chunks)


@needs_av
def test_video_mpeg2(tmp_path):
    path = _build(tmp_path)
    assert path.read_bytes().startswith(b"\x00\x00\x01\xba")
    p = parse_launch(f"mpegpsdemux location={path} stream=video ! "
                     "avdec_mpeg2video ! appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    total = 0
    while (s := sink.pull_sample()) is not None:
        total += np.asarray(s.buffer.data[0]).shape[0]
    assert total == 4


@needs_av
def test_audio_layer2(tmp_path):
    path = _build(tmp_path)
    p = parse_launch(f"mpegpsdemux location={path} stream=audio ! "
                     "mpegaudioparse ! mpg123audiodec ! "
                     "appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    assert pcm.shape[0] > 12000 and pcm.shape[1] == 2


@needs_av
def test_ac3_private_substream(tmp_path):
    path = _build(tmp_path)
    p = parse_launch(f"mpegpsdemux location={path} stream=ac3 ! "
                     "ac3parse ! a52dec ! appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    assert pcm.shape[0] > 12000


@needs_av
def test_typefind_routes_to_psdemux(tmp_path):
    from gstreamer_tpu.utils.typefind import (decodable_for,
                                              type_find_file)
    path = _build(tmp_path)
    mtype, _ = type_find_file(str(path))
    assert decodable_for(mtype) == "mpegpsdemux"


def test_fuzz_ps_parser():
    from gstreamer_tpu.elements.mpegps import _parse_ps
    rng = np.random.default_rng(11)
    for _ in range(20):
        blob = bytes(rng.integers(0, 256, 600, np.uint8))
        _parse_ps(b"\x00\x00\x01\xba" + blob)
