"""aesenc/aesdec (ext/aes), tonegeneratesrc (ext/spandsp reduced),
dashsink (ext/dash) and the id3mux alias."""

import os

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.aes_misc import aes_available
from gstreamer_tpu.native import av as native_av

needs_aes = pytest.mark.skipif(not aes_available(),
                               reason="libcrypto missing")
needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")

KEY128 = "00112233445566778899aabbccddeeff"
KEY256 = KEY128 * 2
IV = "000102030405060708090a0b0c0d0e0f"


@needs_aes
@pytest.mark.parametrize("key", [KEY128, KEY256])
def test_aes_roundtrip(key):
    p = parse_launch(
        f"appsrc name=in ! application/octet-stream ! "
        f"aesenc key={key} iv={IV} ! aesdec key={key} ! "
        "appsink name=out")
    msg = b"secret payload 123" * 7
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(msg, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    p.run()
    out = p.get_by_name("out").pull_sample()
    assert np.asarray(out.buffer.data).tobytes() == msg


@needs_aes
def test_aes_wrong_key_fails():
    p = parse_launch(
        f"appsrc name=in ! application/octet-stream ! "
        f"aesenc key={KEY128} iv={IV} ! "
        f"aesdec key={'ff' * 16} ! appsink name=out")
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(b"x" * 64, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    with pytest.raises(ValueError):
        p.run()


@needs_aes
def test_aes_ciphertext_differs_and_iv_serialized():
    p = parse_launch(
        f"appsrc name=in ! application/octet-stream ! "
        f"aesenc key={KEY128} iv={IV} ! appsink name=out")
    msg = b"hello aes" * 4
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(msg, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    p.run()
    ct = np.asarray(p.get_by_name("out").pull_sample().buffer.data
                    ).tobytes()
    assert ct[:16] == bytes.fromhex(IV)       # serialize-iv default
    assert msg not in ct


def test_tonegeneratesrc_dtmf():
    p = parse_launch("tonegeneratesrc freq=697 freq2=1209 "
                     "num-buffers=4 ! appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    chunks = []
    while (s := sink.pull_sample()) is not None:
        chunks.append(np.asarray(s.buffer.data))
    pcm = np.concatenate(chunks)[:, 0].astype(float)
    spec = np.abs(np.fft.rfft(pcm[:4096]))
    freqs = np.fft.rfftfreq(4096, 1 / 8000)
    top = freqs[np.argsort(spec)[-4:]]
    assert any(abs(f - 697) < 10 for f in top)
    assert any(abs(f - 1209) < 10 for f in top)


@needs_av
def test_dashsink_roundtrip(tmp_path):
    seg = tmp_path / "seg%05d.ts"
    mpd = tmp_path / "manifest.mpd"
    p = parse_launch(
        f"dashsink name=h location={seg} mpd-filename={mpd} "
        "target-duration=1 ! fakesink "
        "videotestsrc num-buffers=60 pattern=gradient ! "
        "video/x-raw,format=I420,width=64,height=48,framerate=30/1 ! "
        "x264enc ! h.sink_0")
    p.run()
    text = mpd.read_text()
    assert "SegmentList" in text and text.count("SegmentURL") == 2
    d = parse_launch(f"dashdemux uri={mpd} stream=video ! "
                     "appsink name=out")
    d.run()
    sink = d.get_by_name("out")
    n = 0
    while (s := sink.pull_sample()) is not None:
        n += np.asarray(s.buffer.data[0]).shape[0]
    assert n == 60


def test_id3mux_alias():
    from gstreamer_tpu.core.element import factory_exists
    assert factory_exists("id3mux")


def test_videoframe_audiolevel_messages():
    p = parse_launch(
        "videoframe_audiolevel name=v ! fakesink "
        "videotestsrc num-buffers=3 ! "
        "video/x-raw,format=I420,width=32,height=32,framerate=30/1 ! "
        "v.video "
        "audiotestsrc num-buffers=3 samplesperbuffer=1470 ! v.audio")
    p.run()
    msgs = [m for m in p.bus.messages()
            if m.type == "element"
            and m.data.get("type") == "videoframe-audiolevel"]
    assert len(msgs) == 3
    # audiotestsrc default 0.8 sine -> RMS 0.8/sqrt(2)
    assert abs(msgs[0].data["rms"][0] - 0.8 / np.sqrt(2)) < 0.01


def test_spanplc_conceals_gap():
    from gstreamer_tpu.elements.misc_elements import SpanPlc
    plc = SpanPlc()
    plc.start()
    t = np.arange(2048) / 8000
    good = np.clip(np.round(np.sin(2 * np.pi * 400 * t) * 10000),
                   -32768, 32767).astype(np.int16)[:, None]
    plc.host_process(Buffer(data=good, batch=1))
    gap = plc.host_process(Buffer(data=np.zeros((800, 1), np.int16),
                                  batch=1, meta={"gap": True}))
    out = np.asarray(gap.data)[:, 0].astype(float)
    head = np.sqrt((out[:100] ** 2).mean())
    tail = np.sqrt((out[-100:] ** 2).mean())
    assert head > 3000          # concealment energy present
    assert tail < head / 4      # fading toward silence


def test_alias_elements_registered():
    from gstreamer_tpu.core.element import factory_exists
    for f in ("mplex", "mpeg2enc", "autodeinterlace",
              "alpha_combine"):
        assert factory_exists(f), f


def test_alpha_combine_meta_path():
    from gstreamer_tpu.elements.cc_sei import AlphaCombine
    y = np.zeros((1, 8, 8), np.uint8)
    u = np.zeros((1, 4, 4), np.uint8)
    out = AlphaCombine().host_process(Buffer(
        data=(y, u, u.copy()), batch=1,
        meta={"alpha": np.full((1, 8, 8), 200, np.uint8)}))
    assert len(out.data) == 4
    assert float(np.asarray(out.data[3]).mean()) == 200.0
    # no alpha meta -> fully opaque plane
    out2 = AlphaCombine().host_process(Buffer(
        data=(y, u, u.copy()), batch=1))
    assert float(np.asarray(out2.data[3]).mean()) == 255.0
