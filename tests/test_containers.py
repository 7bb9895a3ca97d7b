"""AVI + Matroska mux/demux roundtrips (gst-plugins-good/gst/avi and
gst/matroska reduced to the raw-video/PCM family)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


def _pull_video(p, sink_name="out"):
    sink = p.get_by_name(sink_name)
    frames = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = [np.asarray(x) for x in s.buffer.data]
        for k in range(d[0].shape[0]):
            frames.append(tuple(x[k] for x in d))
    return frames


def _pull_audio(p, sink_name="out"):
    sink = p.get_by_name(sink_name)
    chunks = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        chunks.append(np.asarray(s.buffer.data))
    return np.concatenate(chunks, axis=0) if chunks else np.zeros((0, 1))


@pytest.mark.parametrize("mux,demux,ext", [
    ("avimux", "avidemux", "avi"),
    ("matroskamux", "matroskademux", "mkv"),
])
class TestVideoRoundtrip:
    def test_video(self, tmp_path, mux, demux, ext):
        path = tmp_path / f"v.{ext}"
        p = parse_launch(
            f"{mux} name=m location={path} ! fakesink "
            "videotestsrc num-buffers=6 pattern=gradient ! "
            "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
            "m.video_0")
        p.run()
        pr = parse_launch(
            "videotestsrc num-buffers=6 pattern=gradient ! "
            "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
            "appsink name=out")
        pr.run()
        gold = _pull_video(pr)
        pd = parse_launch(
            f"{demux} location={path} stream=video ! appsink name=out")
        pd.run()
        got = _pull_video(pd)
        assert len(got) == len(gold) == 6
        for g, o in zip(gold, got):
            for a, b in zip(g, o):
                np.testing.assert_array_equal(a, b)

    def test_video_caps_from_header(self, tmp_path, mux, demux, ext):
        path = tmp_path / f"v.{ext}"
        p = parse_launch(
            f"{mux} name=m location={path} ! fakesink "
            "videotestsrc num-buffers=2 ! "
            "video/x-raw,format=YUY2,width=32,height=16,framerate=25/1 ! "
            "m.video_0")
        p.run()
        pd = parse_launch(
            f"{demux} location={path} ! appsink name=out")
        dem = [e for e in pd.iterate_elements()
               if e.FACTORY == demux][0]
        caps = dem.get_caps()
        s = caps[0]
        assert s["format"] == "YUY2"
        assert s["width"] == 32 and s["height"] == 16


@pytest.mark.parametrize("mux,demux,ext", [
    ("avimux", "avidemux", "avi"),
    ("matroskamux", "matroskademux", "mkv"),
])
def test_audio_roundtrip(tmp_path, mux, demux, ext):
    path = tmp_path / f"a.{ext}"
    p = parse_launch(
        f"{mux} name=m location={path} ! fakesink "
        "audiotestsrc num-buffers=4 samplesperbuffer=1024 wave=saw ! "
        "m.audio_0")
    p.run()
    pr = parse_launch(
        "audiotestsrc num-buffers=4 samplesperbuffer=1024 wave=saw ! "
        "appsink name=out")
    pr.run()
    gold = _pull_audio(pr)
    pd = parse_launch(
        f"{demux} location={path} stream=audio ! appsink name=out")
    pd.run()
    got = _pull_audio(pd)
    np.testing.assert_array_equal(gold, got)


@pytest.mark.parametrize("mux,ext", [
    ("avimux", "avi"), ("matroskamux", "mkv"),
])
def test_av_interleaved(tmp_path, mux, ext):
    demux = "avidemux" if mux == "avimux" else "matroskademux"
    path = tmp_path / f"av.{ext}"
    p = parse_launch(
        f"{mux} name=m location={path} ! fakesink "
        "videotestsrc num-buffers=4 ! "
        "video/x-raw,format=I420,width=32,height=32,framerate=25/1 ! "
        "m.video_0 "
        "audiotestsrc num-buffers=4 samplesperbuffer=1764 ! m.audio_0")
    p.run()
    pv = parse_launch(f"{demux} location={path} stream=video ! "
                      "appsink name=out")
    pv.run()
    assert len(_pull_video(pv)) == 4
    pa = parse_launch(f"{demux} location={path} stream=audio ! "
                      "appsink name=out")
    pa.run()
    audio = _pull_audio(pa)
    assert audio.shape[0] == 4 * 1764


def test_avi_riff_structure(tmp_path):
    path = tmp_path / "s.avi"
    p = parse_launch(
        f"avimux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=2 ! "
        "video/x-raw,format=I420,width=32,height=32,framerate=25/1 ! "
        "m.video_0")
    p.run()
    data = path.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"idx1" in data
    # typefind must sniff it
    from gstreamer_tpu.utils.typefind import type_find_data
    media, prob = type_find_data(data[:512])
    assert "msvideo" in media


def test_matroska_ebml_header(tmp_path):
    path = tmp_path / "s.mkv"
    p = parse_launch(
        f"matroskamux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=1 ! "
        "video/x-raw,format=I420,width=16,height=16,framerate=25/1 ! "
        "m.video_0")
    p.run()
    data = path.read_bytes()
    assert data[:4] == b"\x1a\x45\xdf\xa3"
    assert b"matroska" in data[:64]
    from gstreamer_tpu.utils.typefind import type_find_data
    media, prob = type_find_data(data[:512])
    assert "matroska" in media or "ebml" in media
