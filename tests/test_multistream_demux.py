"""One-parse multi-stream demuxing (the sometimes-pads analog).

Reference: gst-plugins-good/gst/matroska/matroska-demux.c:1 and
gst-plugins-good/gst/isomp4/qtdemux.c:1 expose a src pad per track
from a single parse; gst-plugins-base/gst/playback/gstdecodebin3.c:1
builds on that.  Here linking `demux.video_0` / `demux.audio_0`
exposes per-track pads fed from ONE file read + container parse.
"""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.native import av as native_av

needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")


def _write_av_mkv(path):
    p = parse_launch(
        f"matroskamux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=8 pattern=gradient ! "
        "video/x-raw,format=I420,width=32,height=32,framerate=25/1 ! "
        "m.video_0 "
        "audiotestsrc num-buffers=8 samplesperbuffer=1024 ! "
        "audio/x-raw,format=S16LE,rate=48000,channels=2 ! m.audio_0")
    p.run()


def _drain(sink):
    out = []
    while (s := sink.pull_sample()) is not None:
        out.append(s.buffer)
    return out


def test_single_parse_feeds_av_branches(tmp_path, monkeypatch):
    """One matroskademux instance drives audio+video sinks with a
    single file read/parse (the VERDICT 'done' criterion)."""
    path = tmp_path / "av.mkv"
    _write_av_mkv(path)

    import gstreamer_tpu.elements.container_elements as ce
    parses = []
    orig = ce._parse_matroska

    def counting(*a, **k):
        parses.append(a[0] if a else None)
        return orig(*a, **k)
    monkeypatch.setattr(ce, "_parse_matroska", counting)

    p = parse_launch(
        f"matroskademux name=d location={path} "
        "d.video_0 ! appsink name=v "
        "d.audio_0 ! appsink name=a")
    p.run()
    vbufs = _drain(p.get_by_name("v"))
    abufs = _drain(p.get_by_name("a"))
    nv = sum(np.asarray(b.data[0]).shape[0] for b in vbufs)
    na = sum(np.asarray(b.data).shape[0] for b in abufs)
    assert nv == 8, nv
    assert na == 8 * 1024, na
    assert len(parses) == 1, f"expected ONE parse, got {len(parses)}"


def test_multistream_caps_per_pad(tmp_path):
    path = tmp_path / "av.mkv"
    _write_av_mkv(path)
    p = parse_launch(
        f"matroskademux name=d location={path} "
        "d.video_0 ! appsink name=v "
        "d.audio_0 ! appsink name=a")
    p.run()
    d = p.get_by_name("d")
    vpad = d.get_pad("video_0")
    apad = d.get_pad("audio_0")
    assert vpad.caps[0].name == "video/x-raw"
    assert vpad.caps[0]["width"] == 32
    assert apad.caps[0].name == "audio/x-raw"
    assert apad.caps[0]["rate"] == 48000
    assert apad.caps[0]["channels"] == 2


def test_multistream_through_convert_chain(tmp_path):
    """Each exposed stream negotiates independently downstream."""
    path = tmp_path / "av.mkv"
    _write_av_mkv(path)
    p = parse_launch(
        f"matroskademux name=d location={path} "
        "d.video_0 ! videoconvert ! video/x-raw,format=RGB ! "
        "appsink name=v "
        "d.audio_0 ! audioconvert ! audio/x-raw,format=F32LE ! "
        "appsink name=a")
    p.run()
    vbufs = _drain(p.get_by_name("v"))
    abufs = _drain(p.get_by_name("a"))
    assert vbufs and abufs
    v0 = np.asarray(vbufs[0].data)
    assert v0.shape[-2:] == (32, 32) or v0.shape[-1] == 3


def test_single_stream_mode_still_works(tmp_path):
    """Backward compatibility: the `stream=` property on the plain
    src pad is unchanged."""
    path = tmp_path / "av.mkv"
    _write_av_mkv(path)
    p = parse_launch(f"matroskademux location={path} stream=audio ! "
                     "appsink name=a")
    p.run()
    abufs = _drain(p.get_by_name("a"))
    assert sum(np.asarray(b.data).shape[0] for b in abufs) == 8 * 1024


@needs_av
def test_qtdemux_one_parse_av(tmp_path, monkeypatch):
    """qtdemux: one moov parse drives h264 video + aac audio
    branches through their decoders."""
    path = tmp_path / "av.mp4"
    p = parse_launch(
        f"cmafmux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=6 ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "x264enc ! m.video_0 "
        "audiotestsrc num-buffers=6 samplesperbuffer=4096 ! "
        "avenc_aac ! m.audio_0")
    p.run()

    import gstreamer_tpu.elements.isomp4 as iso
    parses = []
    orig = iso._parse_qt

    def counting(*a, **k):
        parses.append(1)
        return orig(*a, **k)
    monkeypatch.setattr(iso, "_parse_qt", counting)

    d = parse_launch(
        f"qtdemux name=d location={path} "
        "d.video_0 ! avdec_h264 ! appsink name=v "
        "d.audio_0 ! appsink name=a")
    d.run()
    vbufs = _drain(d.get_by_name("v"))
    abufs = _drain(d.get_by_name("a"))
    nv = sum(np.asarray(b.data[0]).shape[0] for b in vbufs)
    assert nv == 6, nv
    assert abufs
    assert len(parses) == 1, f"expected ONE parse, got {len(parses)}"


@needs_av
def test_uridecodebin_multistream(tmp_path):
    """uridecodebin exposes per-track pads from ONE internal demuxer
    (gsturidecodebin3.c over decodebin3's single-parse graph)."""
    path = tmp_path / "av.mkv"
    _write_av_mkv(path)
    p = parse_launch(
        f"uridecodebin name=u uri=file://{path} "
        "u.video_0 ! appsink name=v "
        "u.audio_0 ! appsink name=a")
    p.run()
    vbufs = _drain(p.get_by_name("v"))
    abufs = _drain(p.get_by_name("a"))
    assert sum(np.asarray(b.data[0]).shape[0] for b in vbufs) == 8
    assert sum(np.asarray(b.data).shape[0] for b in abufs) == 8 * 1024


@needs_av
def test_playbin_av(tmp_path, monkeypatch):
    """playbin3-style A/V: both decoded tracks from one parse."""
    from gstreamer_tpu.core.element import element_factory_make
    path = tmp_path / "av.mp4"
    p = parse_launch(
        f"cmafmux name=m location={path} ! fakesink "
        "videotestsrc num-buffers=6 ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "x264enc ! m.video_0 "
        "audiotestsrc num-buffers=6 samplesperbuffer=4096 ! "
        "avenc_aac ! m.audio_0")
    p.run()

    import gstreamer_tpu.elements.isomp4 as iso
    parses = []
    orig = iso._parse_qt

    def counting(*a, **k):
        parses.append(1)
        return orig(*a, **k)
    monkeypatch.setattr(iso, "_parse_qt", counting)

    pb = element_factory_make("playbin", uri=f"file://{path}")
    pipe, sinks = pb.build_pipeline_av()
    assert set(sinks) == {"video", "audio"}
    nv = 0
    while (s := sinks["video"].pull_sample()) is not None:
        nv += np.asarray(s.buffer.data[0]).shape[0]
    assert nv == 6
    sa = sinks["audio"].pull_sample()
    assert sa is not None
    # probe + decode graph share... the probe instance re-parses once;
    # the decode graph parses once: at most 2 total, never per-branch
    assert len(parses) <= 2, len(parses)
