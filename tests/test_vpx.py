"""VP8/VP9 via the system libvpx (the reference's ext/vpx wraps the
same library), cross-verified against the INDEPENDENT libavcodec
vp8/vp9 decoders (video_oracle): two conformant decoders must produce
bit-identical reconstructions."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import audio_oracle as ao  # noqa: E402
import video_oracle as vo  # noqa: E402

from gstreamer_tpu.core.parse import parse_launch  # noqa: E402
from gstreamer_tpu.codecs import vpx  # noqa: E402

needs_vpx = pytest.mark.skipif(not vpx.available(),
                               reason="system libvpx missing")


def _frames(n=5, w=64, h=48):
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (h, w), np.uint8)
    out = []
    for i in range(n):
        y = np.clip(base.astype(int) + i * 3, 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120 + i, np.uint8)
        v = np.full((h // 2, w // 2), 60, np.uint8)
        out.append((y, u, v))
    return out


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


@needs_vpx
@pytest.mark.parametrize("codec", ["vp8", "vp9"])
class TestCodec:
    def test_roundtrip_psnr(self, codec):
        frames = _frames()
        pkts = vpx.encode_frames(codec, frames, 64, 48)
        assert pkts[0][1] and not any(k for _, k in pkts[1:])
        dec = vpx.decode_packets(codec, [p for p, _ in pkts])
        assert len(dec) == len(frames)
        mse = np.mean((dec[0][0].astype(float)
                       - frames[0][0].astype(float)) ** 2)
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 35

    def test_bit_exact_vs_libavcodec(self, codec):
        frames = _frames()
        pkts = [p for p, _ in vpx.encode_frames(codec, frames, 64, 48)]
        gold = vo.decode_packets(codec, pkts)
        if gold is None:
            pytest.skip("libavcodec oracle unavailable")
        mine = vpx.decode_packets(codec, pkts)
        assert len(gold) == len(mine)
        for g, m in zip(gold, mine):
            for a, b in zip(g, m):
                np.testing.assert_array_equal(a, b)

    def test_element_roundtrip(self, codec, tmp_path):
        path = tmp_path / "v.ivf"
        p = parse_launch(
            f"videotestsrc num-buffers=5 pattern=gradient ! "
            "video/x-raw,format=I420,width=64,height=48,framerate=30/1 "
            f"! {codec}enc location={path}")
        p.run()
        d = parse_launch(f"{codec}dec location={path} ! "
                         "appsink name=out")
        d.run()
        got = _pull_video(d)
        assert len(got) == 5
        assert got[0][0].shape == (48, 64)
        pr = parse_launch(
            "videotestsrc num-buffers=1 pattern=gradient ! "
            "video/x-raw,format=I420,width=64,height=48,framerate=30/1 "
            "! appsink name=out")
        pr.run()
        gold = _pull_video(pr)[0]
        mse = np.mean((got[0][0].astype(float)
                       - gold[0].astype(float)) ** 2)
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 30

    def test_webm_track(self, codec, tmp_path):
        path = tmp_path / "v.webm"
        p = parse_launch(
            f"webmmux name=m location={path} video-codec={codec} ! "
            "fakesink "
            "videotestsrc num-buffers=5 ! "
            "video/x-raw,format=I420,width=64,height=48,framerate=30/1 "
            "! m.video_0")
        p.run()
        data = path.read_bytes()
        assert b"webm" in data[:64]
        assert (b"V_VP8" if codec == "vp8" else b"V_VP9") in data
        d = parse_launch(
            f"matroskademux location={path} stream=video ! "
            "appsink name=out")
        d.run()
        got = _pull_video(d)
        assert len(got) == 5 and got[0][0].shape == (48, 64)


@needs_vpx
@pytest.mark.skipif(not ao.have_vorbis(),
                    reason="system libvorbis missing")
def test_webm_av_vp8_vorbis(tmp_path):
    """Full WebM A/V: VP8 video + Vorbis audio, demuxed back."""
    path = tmp_path / "av.webm"
    p = parse_launch(
        f"webmmux name=m location={path} video-codec=vp8 "
        "audio-codec=vorbis ! fakesink "
        "videotestsrc num-buffers=5 ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "m.video_0 "
        "audiotestsrc num-buffers=5 samplesperbuffer=4096 ! m.audio_0")
    p.run()
    pv = parse_launch(
        f"matroskademux location={path} stream=video ! appsink name=out")
    pv.run()
    assert len(_pull_video(pv)) == 5
    pa = parse_launch(
        f"matroskademux location={path} stream=audio ! appsink name=out")
    pa.run()
    s = pa.get_by_name("out").pull_sample()
    assert s is not None and np.asarray(s.buffer.data).dtype == np.float32


@needs_vpx
def test_ivf_parse_errors():
    with pytest.raises(ValueError):
        vpx.parse_ivf(b"XXXX" + b"\0" * 40)
    hdr = vpx.ivf_header("vp8", 64, 48, (30, 1), 0)
    codec, w, h, fps, pkts = vpx.parse_ivf(hdr)
    assert (codec, w, h, pkts) == ("vp8", 64, 48, [])


@needs_vpx
def test_webm_alpha_roundtrip(tmp_path):
    """WebM transparency: the alpha plane travels as a second VP8
    stream in BlockAdditions (the codec-alpha convention —
    gst-plugins-bad/gst/codecalpha; matroska-mux/demux BlockMore)."""
    from gstreamer_tpu.core.buffer import Buffer
    path = tmp_path / "alpha.webm"
    rng = np.random.default_rng(0)
    W, H, N = 64, 48, 4
    y = rng.integers(0, 256, (N, H, W), np.uint8)
    u = np.full((N, H // 2, W // 2), 100, np.uint8)
    v = np.full((N, H // 2, W // 2), 200, np.uint8)
    a = np.zeros((N, H, W), np.uint8)
    a[:, :, :W // 2] = 255                    # left half opaque
    p = parse_launch(
        f"webmmux name=m location={path} video-codec=vp8 ! fakesink "
        "appsrc name=in caps=video/x-raw,format=A420,width=64,"
        "height=48,framerate=30/1 ! m.video_0")
    p.get_by_name("in").push_buffer(Buffer(
        data=(y, u, v, a), batch=N, pts=0, duration=33_333_333))
    p.get_by_name("in").end_of_stream()
    p.run()
    d = parse_launch(f"matroskademux location={path} stream=video ! "
                     "appsink name=out")
    d.run()
    s = d.get_by_name("out").pull_sample()
    assert s.caps[0]["format"] == "A420"
    planes = [np.asarray(q) for q in s.buffer.data]
    assert len(planes) == 4
    alpha = planes[3]
    assert float(alpha[..., :W // 2].mean()) > 250
    assert float(alpha[..., W // 2:].mean()) < 5
