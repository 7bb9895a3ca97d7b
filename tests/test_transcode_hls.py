"""hlssink2 (gst-plugins-bad/ext/hls/gsthlssink2.c analog) and
uritranscodebin/transcodebin (gst/transcode) profile-driven paths."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import numpy as np
import pytest

from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.native import av as native_av

needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")


def _frames(p, name="out"):
    sink = p.get_by_name(name)
    total = 0
    while (s := sink.pull_sample()) is not None:
        total += np.asarray(s.buffer.data[0]).shape[0]
    return total


@needs_av
def test_hlssink2_segments_and_playlist(tmp_path):
    seg = tmp_path / "seg%05d.ts"
    pl = tmp_path / "playlist.m3u8"
    p = parse_launch(
        f"hlssink2 name=h location={seg} playlist-location={pl} "
        "target-duration=1 ! fakesink "
        "videotestsrc num-buffers=90 pattern=gradient ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "x264enc ! h.sink_0")
    p.run()
    text = pl.read_text()
    assert text.count("#EXTINF") == 3          # 3 s at 1 s targets
    assert "#EXT-X-ENDLIST" in text
    segs = sorted(f for f in os.listdir(tmp_path)
                  if f.endswith(".ts"))
    assert len(segs) == 3
    # full circle: read it back through hlsdemux's decode mode
    d = parse_launch(f"hlsdemux uri={pl} stream=video ! "
                     "appsink name=out")
    d.run()
    assert _frames(d) == 90


def _make_src(tmp_path):
    src = tmp_path / "in.mkv"
    p = parse_launch(
        f"matroskamux name=m location={src} ! fakesink "
        "videotestsrc num-buffers=5 pattern=gradient ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "x264enc ! m.video_0 "
        "audiotestsrc num-buffers=5 samplesperbuffer=4096 ! "
        "avenc_aac ! m.audio_0")
    p.run()
    return src


@needs_av
def test_uritranscodebin_mkv_to_mp4_hevc(tmp_path):
    src = _make_src(tmp_path)
    dst = tmp_path / "out.mp4"
    tb = element_factory_make("uritranscodebin", **{
        "source-uri": f"file://{src}", "dest-uri": str(dst),
        "profile": "video/quicktime:video/x-h265:audio/mpeg"})
    assert tb.transcode() == str(dst)
    pv = parse_launch(f"qtdemux location={dst} stream=video ! "
                      "avdec_h265 ! appsink name=out")
    pv.run()
    assert _frames(pv) == 5
    pa = parse_launch(f"qtdemux location={dst} stream=audio ! "
                      "appsink name=out")
    pa.run()
    s = pa.get_by_name("out").pull_sample()
    assert s is not None


@needs_av
def test_uritranscodebin_to_webm_vp9_vorbis(tmp_path):
    import audio_oracle as ao
    if not ao.have_vorbis():
        pytest.skip("libvorbis missing")
    src = _make_src(tmp_path)
    dst = tmp_path / "out.webm"
    tb = element_factory_make("uritranscodebin", **{
        "source-uri": str(src), "dest-uri": str(dst),
        "profile": "video/webm:video/x-vp8:audio/x-vorbis"})
    tb.transcode()
    data = dst.read_bytes()
    assert b"webm" in data[:64]
    assert b"V_VP8" in data and b"A_VORBIS" in data
    d = parse_launch(f"matroskademux location={dst} stream=video ! "
                     "appsink name=out")
    d.run()
    assert _frames(d) == 5


@needs_av
def test_uritranscodebin_bad_profile(tmp_path):
    src = _make_src(tmp_path)
    tb = element_factory_make("uritranscodebin", **{
        "source-uri": str(src), "dest-uri": str(tmp_path / "x.bin"),
        "profile": "application/x-nope:video/x-h264"})
    with pytest.raises(ValueError):
        tb.transcode()


@needs_av
def test_dashsink_cmaf_roundtrip(tmp_path):
    """segment-format=fmp4: init.mp4 + .m4s moof segments with an
    Initialization MPD entry, decoded back via the fragment-aware
    qtdemux path."""
    seg = tmp_path / "seg%05d.m4s"
    mpd = tmp_path / "manifest.mpd"
    p = parse_launch(
        f"dashsink name=h location={seg} mpd-filename={mpd} "
        "segment-format=fmp4 target-duration=1 ! fakesink "
        "videotestsrc num-buffers=60 pattern=gradient ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "x264enc ! h.sink_0")
    p.run()
    text = mpd.read_text()
    assert 'mimeType="video/mp4"' in text
    assert "Initialization" in text
    assert (tmp_path / "init.mp4").exists()
    assert len(list(tmp_path.glob("*.m4s"))) == 2
    d = parse_launch(f"dashdemux uri={mpd} stream=video ! "
                     "appsink name=out")
    d.run()
    assert _frames(d) == 60
