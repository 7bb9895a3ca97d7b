"""avdec_*/avenc_*/x264enc/x265enc — the gst-libav analog elements
over the system libavcodec (native/gtpu_av.cpp shim).

Reference: gst-libav/ext/libav/gstavviddec.c:1 / gstavvidenc.c:1,
gst-plugins-ugly/ext/x264/gstx264enc.c:1."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from gstreamer_tpu.core.parse import parse_launch  # noqa: E402
from gstreamer_tpu.native import av as native_av  # noqa: E402

needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")

SRC = ("videotestsrc num-buffers=5 pattern=gradient ! "
       "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! ")


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


def _gold_frame():
    p = parse_launch(
        "videotestsrc num-buffers=1 pattern=gradient ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "appsink name=out")
    p.run()
    return _pull_video(p)[0]


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-9))


@needs_av
@pytest.mark.parametrize("enc,dec", [
    ("x264enc", "avdec_h264"),
    ("x265enc", "avdec_h265"),
    ("avenc_mpeg2video", "avdec_mpeg2video"),
    ("avenc_mpeg4", "avdec_mpeg4"),
])
def test_direct_chain(enc, dec):
    import gstreamer_tpu.elements  # noqa: F401 (populate registry)
    from gstreamer_tpu.core.element import _REGISTRY
    if enc not in _REGISTRY or dec not in _REGISTRY:
        pytest.skip(f"{enc}/{dec} not in system libavcodec")
    p = parse_launch(f"{SRC}{enc} ! {dec} ! appsink name=out")
    p.run()
    frames = _pull_video(p)
    assert len(frames) == 5
    assert frames[0][0].shape == (48, 64)
    assert _psnr(frames[0][0], _gold_frame()[0]) > 30


@needs_av
@pytest.mark.parametrize("mux,demux,ext", [
    ("matroskamux", "matroskademux", "mkv"),
    ("qtmux", "qtdemux", "mp4"),
    ("avimux", "avidemux", "avi"),
    ("mpegtsmux", "tsdemux", "ts"),
])
def test_h264_through_containers(tmp_path, mux, demux, ext):
    path = tmp_path / f"v.{ext}"
    p = parse_launch(
        f"{mux} name=m location={path} ! fakesink "
        + SRC + "x264enc ! "
        + ("m.video_0" if ext in ("mkv", "avi", "mp4") else "m.sink_0"))
    p.run()
    assert path.stat().st_size > 500
    tail = (" ! h264parse" if ext == "ts" else "")
    d = parse_launch(
        f"{demux} location={path} stream=video{tail} ! avdec_h264 ! "
        "appsink name=out") if ext != "ts" else parse_launch(
        f"{demux} location={path} ! h264parse ! avdec_h264 ! "
        "appsink name=out")
    d.run()
    frames = _pull_video(d)
    assert len(frames) == 5
    assert _psnr(frames[0][0], _gold_frame()[0]) > 30


@needs_av
def test_bitrate_property():
    import gstreamer_tpu.elements  # noqa: F401 (populate registry)
    from gstreamer_tpu.core.element import _REGISTRY
    if "x264enc" not in _REGISTRY:
        pytest.skip("x264enc missing")
    p = parse_launch(f"{SRC}x264enc bitrate=100 ! appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    total = 0
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = s.buffer.data
        blobs = d if isinstance(d, list) else [d]
        total += sum(np.asarray(b).size for b in blobs)
    assert total > 0


@needs_av
@pytest.mark.parametrize("enc,dec,cid", [
    ("x265enc", "avdec_h265", b"V_MPEGH/ISO/HEVC"),
    ("av1enc", "avdec_av1", b"V_AV1"),
])
def test_hevc_av1_matroska_tracks(tmp_path, enc, dec, cid):
    """HEVC (hvcC CodecPrivate) and AV1 (av1C) tracks in Matroska
    (matroska-mux.c / matroska-demux.c codec handling)."""
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if enc not in _REGISTRY or dec not in _REGISTRY:
        pytest.skip(f"{enc}/{dec} not in system libavcodec")
    path = tmp_path / "v.mkv"
    p = parse_launch(
        f"matroskamux name=m location={path} ! fakesink "
        + SRC + f"{enc} ! m.video_0")
    p.run()
    data = path.read_bytes()
    assert cid in data
    d = parse_launch(
        f"matroskademux location={path} stream=video ! {dec} ! "
        "appsink name=out")
    d.run()
    frames = _pull_video(d)
    assert len(frames) == 5
    assert _psnr(frames[0][0], _gold_frame()[0]) > 25


@needs_av
def test_av1_mp4_av01(tmp_path):
    """AV1 in mp4: av01 sample entry with av1C (qtmux/qtdemux)."""
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "av1enc" not in _REGISTRY:
        pytest.skip("libaom not in system libavcodec")
    path = tmp_path / "v.mp4"
    p = parse_launch(
        f"qtmux name=m location={path} ! fakesink "
        + SRC + "av1enc ! m.video_0")
    p.run()
    data = path.read_bytes()
    assert b"av01" in data and b"av1C" in data
    d = parse_launch(
        f"qtdemux location={path} stream=video ! avdec_av1 ! "
        "appsink name=out")
    d.run()
    frames = _pull_video(d)
    assert len(frames) == 5
    assert _psnr(frames[0][0], _gold_frame()[0]) > 25


@needs_av
def test_ogg_speex_mapping(tmp_path):
    """Ogg-Speex BOS dispatch in oggdemux (gst-plugins-good
    ext/speex architecture: libspeex does the codec)."""
    from gstreamer_tpu.elements.ogg import ogg_page
    from gstreamer_tpu.native.av import AvAudioEncoder
    rate = 16000
    t = np.arange(rate) / rate
    pcm = (np.sin(2 * np.pi * 440 * t) * 0.4).astype(
        np.float32)[:, None]
    try:
        enc = AvAudioEncoder("libspeex", rate, 1)
    except RuntimeError:
        pytest.skip("libspeex not in system libavcodec")
    pkts = enc.encode_all(pcm)
    hdr = enc.extradata()
    pages = [ogg_page([hdr], 7, 0, 0, bos=True),
             ogg_page([b"\x00" * 8], 7, 1, 0)]
    g = 0
    for i, pk in enumerate(pkts):
        g += 320
        pages.append(ogg_page([pk], 7, 2 + i, g,
                              eos=(i == len(pkts) - 1)))
    path = tmp_path / "s.spx"
    path.write_bytes(b"".join(pages))
    p = parse_launch(f"oggdemux location={path} ! appsink name=out")
    p.run()
    pcm_out = _pull_audio(p)
    assert pcm_out.shape[0] > 12000
    spec = np.abs(np.fft.rfft(pcm_out[2048:2048 + 8192, 0]))
    assert spec.max() > 20 * np.median(spec + 1e-12)


@needs_av
def test_hevc_mp4_hvc1(tmp_path):
    """HEVC in mp4: hvc1 sample entry with hvcC (qtmux/qtdemux)."""
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "x265enc" not in _REGISTRY:
        pytest.skip("x265 not in system libavcodec")
    path = tmp_path / "v.mp4"
    p = parse_launch(
        f"qtmux name=m location={path} ! fakesink "
        + SRC + "x265enc ! m.video_0")
    p.run()
    data = path.read_bytes()
    assert b"hvc1" in data and b"hvcC" in data
    d = parse_launch(
        f"qtdemux location={path} stream=video ! avdec_h265 ! "
        "appsink name=out")
    d.run()
    frames = _pull_video(d)
    assert len(frames) == 5
    assert _psnr(frames[0][0], _gold_frame()[0]) > 25


@needs_av
def test_hevc_through_mpegts(tmp_path):
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "x265enc" not in _REGISTRY:
        pytest.skip("x265 not in system libavcodec")
    ts = tmp_path / "v.ts"
    p = parse_launch(f"{SRC}x265enc ! mpegtsmux location={ts}")
    p.run()
    d = parse_launch(f"tsdemux location={ts} ! avdec_h265 ! "
                     "appsink name=out")
    d.run()
    frames = _pull_video(d)
    assert len(frames) == 5
    assert _psnr(frames[0][0], _gold_frame()[0]) > 25


def _pull_audio(p, sink_name="out"):
    sink = p.get_by_name(sink_name)
    chunks = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        chunks.append(np.asarray(s.buffer.data))
    return np.concatenate(chunks, axis=0) if chunks else np.zeros((0, 1))


@needs_av
def test_ac3_chain():
    """audiotestsrc ! avenc_ac3 ! a52dec: lossy roundtrip must
    preserve the signal (a52dec analog of gst-plugins-ugly a52dec)."""
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "avenc_ac3" not in _REGISTRY or "a52dec" not in _REGISTRY:
        pytest.skip("ac3 not in system libavcodec")
    p = parse_launch(
        "audiotestsrc num-buffers=16 samplesperbuffer=4096 wave=sine ! "
        "avenc_ac3 ! a52dec ! appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    assert pcm.shape[0] > 40000 and pcm.dtype == np.float32
    # the tone must survive: dominant frequency energy
    spec = np.abs(np.fft.rfft(pcm[4096:4096 + 16384, 0]))
    peak = np.argmax(spec)
    assert spec[peak] > 10 * np.median(spec + 1e-9)


@needs_av
def test_ac3_through_mpegts(tmp_path):
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "avenc_ac3" not in _REGISTRY:
        pytest.skip("ac3 not in system libavcodec")
    ts = tmp_path / "a.ts"
    p = parse_launch(
        "audiotestsrc num-buffers=16 samplesperbuffer=4096 ! "
        f"avenc_ac3 ! mpegtsmux location={ts}")
    p.run()
    d = parse_launch(f"tsdemux location={ts} ! ac3parse ! a52dec ! "
                     "appsink name=out")
    d.run()
    pcm = _pull_audio(d)
    assert pcm.shape[0] > 40000


@needs_av
@pytest.mark.parametrize("mux,demux,ext,aac_marker", [
    ("qtmux", "qtdemux", "mp4", b"mp4a"),
    ("matroskamux", "matroskademux", "mkv", b"A_AAC"),
])
def test_av_authoring_h264_aac(tmp_path, mux, demux, ext, aac_marker):
    """Full A/V authoring: x264 video + AAC audio muxed, then demuxed
    back through the clean-room AAC decoder."""
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "avenc_aac" not in _REGISTRY or "x264enc" not in _REGISTRY:
        pytest.skip("aac/x264 not in system libavcodec")
    path = tmp_path / f"av.{ext}"
    p = parse_launch(
        f"{mux} name=m location={path} ! fakesink "
        + SRC + "x264enc ! m.video_0 "
        "audiotestsrc num-buffers=5 samplesperbuffer=4096 ! "
        "avenc_aac ! m.audio_0")
    p.run()
    assert aac_marker in path.read_bytes()
    pa = parse_launch(
        f"{demux} location={path} stream=audio ! appsink name=out")
    pa.run()
    pcm = _pull_audio(pa)
    assert pcm.shape[0] > 15000 and pcm.dtype == np.float32
    # the 440 Hz default tone must survive the lossy roundtrip
    spec = np.abs(np.fft.rfft(pcm[2048:2048 + 16384, 0]))
    assert np.argmax(spec) > 0
    pv = parse_launch(
        f"{demux} location={path} stream=video ! avdec_h264 ! "
        "appsink name=out")
    pv.run()
    frames = _pull_video(pv)
    assert len(frames) == 5
    assert _psnr(frames[0][0], _gold_frame()[0]) > 30


@needs_av
@pytest.mark.parametrize("chain,min_samples", [
    ("audiotestsrc num-buffers=8 samplesperbuffer=4096 ! "
     "twolamemp2enc ! mpg123audiodec", 30000),
    ("audiotestsrc num-buffers=4 samplesperbuffer=4096 ! "
     "wavpackenc ! wavpackdec", 15000),
    ("audiotestsrc num-buffers=4 samplesperbuffer=4096 ! "
     "audio/x-raw,rate=16000,channels=1,format=S16LE ! "
     "speexenc ! speexdec", 15000),
    ("audiotestsrc num-buffers=4 samplesperbuffer=4096 ! "
     "audio/x-raw,rate=8000,channels=1,format=S16LE ! "
     "gsmenc ! gsmdec", 15000),
])
def test_audio_codec_chains(chain, min_samples):
    """speex/wavpack/gsm/twolame wrapper chains (-good ext/speex,
    ext/wavpack, ext/twolame; -bad ext/gsm).  The mp2 chain decodes
    through the CLEAN-ROOM layer-II decoder — an independent
    cross-check of both sides."""
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    enc = chain.split("!")[-2].strip()
    if enc.split()[0] not in _REGISTRY:
        pytest.skip(f"{enc} unavailable")
    p = parse_launch(chain + " ! appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    assert pcm.shape[0] > min_samples
    # the default 440 Hz tone must survive every lossy roundtrip
    spec = np.abs(np.fft.rfft(pcm[2048:2048 + 8192, 0]))
    assert spec.max() > 20 * np.median(spec + 1e-12)


@needs_av
def test_wavpack_lossless():
    """wavpackenc default mode is lossless: output must be exact."""
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "wavpackenc" not in _REGISTRY:
        pytest.skip("wavpack unavailable")
    p = parse_launch("audiotestsrc num-buffers=4 samplesperbuffer=4096 "
                     "! wavpackenc ! wavpackdec ! appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    g = parse_launch("audiotestsrc num-buffers=4 samplesperbuffer=4096 "
                     "! appsink name=out")
    g.run()
    gold = _pull_audio(g).astype(np.float64) / 32768.0
    n = min(len(gold), len(pcm))
    np.testing.assert_allclose(pcm[:n], gold[:n], atol=1.0 / 32768.0)


@needs_av
def test_avdec_matches_oracle_decode():
    """The avdec element's plumbing must reproduce a straight
    libavcodec decode of the same packets (video_oracle)."""
    import video_oracle as vo
    from gstreamer_tpu.native.av import AvVideoEncoder
    rng = np.random.default_rng(3)
    frames = []
    base = rng.integers(0, 256, (48, 64), np.uint8)
    for i in range(4):
        y = np.clip(base.astype(int) + 2 * i, 0, 255).astype(np.uint8)
        u = np.full((24, 32), 100, np.uint8)
        v = np.full((24, 32), 200, np.uint8)
        frames.append((y, u, v))
    enc = AvVideoEncoder("libx264", 64, 48, (30, 1), 300000,
                         "preset=veryfast:tune=zerolatency")
    pkts = []
    for f in frames:
        pkts += [p for p, _ in enc.encode(f)]
    pkts += [p for p, _ in enc.flush()]
    gold = vo.decode_packets("h264", pkts)
    if gold is None:
        pytest.skip("oracle unavailable")
    from gstreamer_tpu.native.av import AvVideoDecoder
    dec = AvVideoDecoder("h264")
    mine = []
    for p in pkts:
        mine += dec.decode(p)
    mine += dec.flush()
    assert len(mine) == len(gold) == 4
    for g, m in zip(gold, mine):
        for a, b in zip(g, m):
            np.testing.assert_array_equal(a, b)


@needs_av
def test_discoverer_reports_coded_tracks(tmp_path):
    """Media introspection must name the coded tracks
    (gstdiscoverer.c stream info)."""
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    from gstreamer_tpu.utils.discoverer import Discoverer
    if "x264enc" not in _REGISTRY or "avenc_aac" not in _REGISTRY:
        pytest.skip("x264/aac unavailable")
    mkv = tmp_path / "av.mkv"
    p = parse_launch(
        f"matroskamux name=m location={mkv} ! fakesink "
        + SRC + "x264enc ! m.video_0 "
        "audiotestsrc num-buffers=5 samplesperbuffer=4096 ! "
        "avenc_aac ! m.audio_0")
    p.run()
    info = Discoverer().discover(str(mkv))
    kinds = {s.kind: s.format for s in info.streams}
    assert kinds["video"] == "V_MPEG4/ISO/AVC"
    assert kinds["audio"] == "A_AAC"


@needs_av
def test_lame_mp3_vs_cleanroom_decoder():
    """lamemp3enc output decoded by the CLEAN-ROOM mp3 decoder."""
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "lamemp3enc" not in _REGISTRY:
        pytest.skip("libmp3lame unavailable")
    p = parse_launch("audiotestsrc num-buffers=8 samplesperbuffer=4096 "
                     "! lamemp3enc ! mpg123audiodec ! appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    assert pcm.shape[0] > 30000
    spec = np.abs(np.fft.rfft(pcm[2048:2048 + 8192, 0]))
    assert spec.max() > 20 * np.median(spec + 1e-12)


@needs_av
def test_sbc_chain():
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "sbcenc" not in _REGISTRY:
        pytest.skip("sbc unavailable")
    p = parse_launch("audiotestsrc num-buffers=4 samplesperbuffer=4096 "
                     "! audio/x-raw,rate=44100,channels=2,format=S16LE "
                     "! sbcenc ! sbcdec ! appsink name=out")
    p.run()
    pcm = _pull_audio(p)
    assert pcm.shape[0] > 12000 and pcm.shape[1] == 2


@needs_av
def test_webp_image_chain():
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "webpenc" not in _REGISTRY:
        pytest.skip("libwebp unavailable")
    p = parse_launch(SRC.replace("num-buffers=5", "num-buffers=2")
                     + "webpenc ! webpdec ! appsink name=out")
    p.run()
    frames = _pull_video(p)
    assert len(frames) == 2
    assert _psnr(frames[0][0], _gold_frame()[0]) > 25


@needs_av
def test_ffv1_lossless_chain():
    """FFV1 default mode is lossless: bit-exact roundtrip required
    (decoder dims pre-set from caps — ffv1 carries no extradata)."""
    import gstreamer_tpu.elements  # noqa: F401
    from gstreamer_tpu.core.element import _REGISTRY
    if "avenc_ffv1" not in _REGISTRY:
        pytest.skip("ffv1 unavailable")
    p = parse_launch(SRC + "avenc_ffv1 ! avdec_ffv1 ! appsink name=out")
    p.run()
    frames = _pull_video(p)
    g = parse_launch(SRC + "appsink name=out")
    g.run()
    gold = _pull_video(g)
    assert len(frames) == len(gold) == 5
    for a, b in zip(gold, frames):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


@needs_av
def test_audio_decode_small_buffer_resizes_safely():
    """Regression: the recv-audio capacity is counted in total floats
    (n*channels), so an undersized buffer grows instead of the C side
    writing past it (heap overflow with >8-channel streams)."""
    import numpy as np
    from gstreamer_tpu.native.av import AvAudioDecoder, AvAudioEncoder
    enc = AvAudioEncoder("libmp3lame", 48000, 2, 128000)
    t = np.arange(4800) / 48000.0
    pcm = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.sin(2 * np.pi * 880 * t)], 1).astype(np.float32)
    pkts = enc.encode_all(pcm)
    dec = AvAudioDecoder("mp3")
    dec._buf = np.empty(16, np.float32)       # force the resize path
    frames = []
    for p in pkts:
        frames += dec.decode(p)
    frames += dec.flush()
    got = np.concatenate(frames) if frames else np.empty((0, 2))
    assert got.shape[0] > 1000 and got.shape[1] == 2
    # the buffer grew to hold one interleaved frame (1152 x 2 ch)
    assert dec._buf.size >= 1152 * 2
    assert np.isfinite(got).all()
