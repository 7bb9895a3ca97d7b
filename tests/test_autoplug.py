"""uridecodebin / playbin autoplug routing over the sniffed-type table
(gstdecodebin3.c rank-sorted factory selection, collapsed to the
DECODABLE route map in utils/typefind.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import audio_oracle as ao  # noqa: E402

from gstreamer_tpu.core.parse import parse_launch  # noqa: E402
from gstreamer_tpu.utils.typefind import decodable_for  # noqa: E402


def _pull_all(p, name="out"):
    sink = p.get_by_name(name)
    got = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        got.append(s)
    return got


def test_decodable_prefix_routing():
    assert decodable_for("audio/mpeg, mpegversion=(int)1, layer=(int)3"
                         ) == ("filesrc location={path} ! "
                               "mpegaudioparse ! mpg123audiodec")
    assert decodable_for("video/quicktime, variant=(string)iso"
                         ) == "qtdemux"
    assert decodable_for("video/x-matroska") == "matroskademux"
    assert decodable_for("application/x-unknown") is None


def test_uridecodebin_mkv_video(tmp_path):
    path = tmp_path / "v.mkv"
    p = parse_launch(
        f"matroskamux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=4 ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "m.video_0")
    p.run()
    d = parse_launch(f"uridecodebin uri=file://{path} ! "
                     "appsink name=out")
    d.run()
    samples = _pull_all(d)
    n = sum(s.buffer.batch for s in samples)
    assert n == 4
    assert samples[0].caps[0]["format"] == "I420"


@pytest.mark.skipif(not (ao.have_lame() and ao.have_mpg123()),
                    reason="system lame/mpg123 missing")
def test_uridecodebin_mp3_chain(tmp_path):
    rate = 44100
    t = np.arange(rate // 4) / rate
    sig = np.clip(np.round(np.stack([np.sin(2 * np.pi * 440 * t)] * 2,
                                    1) * 0.4 * 32767),
                  -32768, 32767).astype(np.int16)
    blob = ao.lame_encode(sig, rate)
    path = tmp_path / "t.mp3"
    path.write_bytes(blob)
    d = parse_launch(f"uridecodebin uri=file://{path} ! "
                     "appsink name=out")
    d.run()
    samples = _pull_all(d)
    assert samples and samples[0].caps[0]["rate"] == rate
    pcm = np.concatenate([np.asarray(s.buffer.data) for s in samples])
    gold, _, _ = ao.mpg123_decode(blob)
    assert abs(len(pcm) - len(gold)) < 2


def test_uridecodebin_mp4_h264_decodes(tmp_path):
    """mp4 with H.264 video: the route must append avdec_h264 so the
    bin emits raw frames, not coded AUs."""
    from gstreamer_tpu.native import av as native_av
    if not native_av.available():
        pytest.skip("libavcodec shim unavailable")
    path = tmp_path / "v.mp4"
    p = parse_launch(
        f"qtmux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=4 ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "x264enc ! m.video_0")
    p.run()
    d = parse_launch(f"uridecodebin uri=file://{path} ! "
                     "appsink name=out")
    d.run()
    samples = _pull_all(d)
    assert samples
    assert samples[0].caps[0].name == "video/x-raw"
    total = sum(s.buffer.batch for s in samples)
    assert total == 4


@pytest.mark.skipif(not ao.have_vorbis(),
                    reason="system libvorbis missing")
def test_playbin_ogg_vorbis(tmp_path):
    from gstreamer_tpu.codecs import vorbis_enc
    rate = 44100
    t = np.arange(rate // 4) / rate
    pcm = np.sin(2 * np.pi * 440 * t)[:, None] * 0.4
    path = tmp_path / "a.ogg"
    path.write_bytes(vorbis_enc.encode_ogg(
        pcm.astype(np.float32), rate))
    from gstreamer_tpu.core.element import element_factory_make
    pb = element_factory_make("playbin", uri=f"file://{path}")
    pipe, sink = pb.build_pipeline()
    pipe.run()
    s = sink.pull_sample()
    assert s is not None
    assert int(s.caps[0]["rate"]) == rate
