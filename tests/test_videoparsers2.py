"""Round-3 video parsers: h265parse, mpeg4videoparse, av1parse,
vp9parse (superframe split), pngparse
(gst-plugins-bad/gst/videoparsers + gst-plugins-good pngparse)."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.native import av as native_av

needs_av = pytest.mark.skipif(not native_av.available(),
                              reason="libavcodec shim unavailable")


def _feed(factory, blob, caps="application/octet-stream"):
    p = parse_launch(f"appsrc name=in ! {caps} ! {factory} ! "
                     "appsink name=out")
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(blob, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    p.run()
    sink = p.get_by_name("out")
    n = 0
    while (s := sink.pull_sample()) is not None:
        d = s.buffer.data
        n += len(d) if isinstance(d, list) else s.buffer.batch
    return n


def _enc_stream(codec, n=4, opts=""):
    from gstreamer_tpu.native.av import AvVideoEncoder
    enc = AvVideoEncoder(codec, 64, 48, (30, 1), 200000, opts)
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (48, 64), np.uint8)
    u = np.full((24, 32), 128, np.uint8)
    pkts = []
    for i in range(n):
        y = np.clip(base.astype(int) + i, 0, 255).astype(np.uint8)
        pkts += [p for p, _ in enc.encode((y, u, u))]
    pkts += [p for p, _ in enc.flush()]
    return b"".join(pkts)


@needs_av
def test_h265parse_au_split():
    blob = _enc_stream(
        "libx265",
        opts="preset=veryfast:tune=zerolatency:"
             "x265-params=log-level=none")
    assert _feed("h265parse", blob) == 4


@needs_av
def test_h265parse_then_decode():
    blob = _enc_stream(
        "libx265",
        opts="preset=veryfast:tune=zerolatency:"
             "x265-params=log-level=none")
    p = parse_launch("appsrc name=in ! application/octet-stream ! "
                     "h265parse ! avdec_h265 ! appsink name=out")
    p.get_by_name("in").push_buffer(Buffer(
        data=np.frombuffer(blob, np.uint8), pts=0))
    p.get_by_name("in").end_of_stream()
    p.run()
    sink = p.get_by_name("out")
    n = 0
    while (s := sink.pull_sample()) is not None:
        n += np.asarray(s.buffer.data[0]).shape[0]
    assert n == 4


@needs_av
def test_mpeg4videoparse_vop_split():
    assert _feed("mpeg4videoparse", _enc_stream("mpeg4")) == 4


@needs_av
def test_av1parse_temporal_units():
    blob = _enc_stream("libaom-av1",
                       opts="usage=realtime:cpu-used=8")
    assert _feed("av1parse", blob) == 4


def test_pngparse_concatenated():
    from gstreamer_tpu.codecs.png import png_encode
    rng = np.random.default_rng(0)
    one = png_encode(rng.integers(0, 256, (16, 16, 3), np.uint8))
    assert _feed("pngparse", one + one + one) == 3


def test_vp9_superframe_split():
    from gstreamer_tpu.elements.videoparsers import Vp9Parse
    f1, f2 = b"\x11" * 10, b"\x22" * 20
    marker = bytes([0xC9])       # 2 frames, 2-byte sizes
    idx = marker + (10).to_bytes(2, "little") \
        + (20).to_bytes(2, "little") + marker
    parts = Vp9Parse.split_superframe(f1 + f2 + idx)
    assert parts == [f1, f2]
    # non-superframe passthrough
    assert Vp9Parse.split_superframe(f1) == [f1]


def test_parser_fuzz():
    rng = np.random.default_rng(5)
    for factory in ("h265parse", "mpeg4videoparse", "av1parse",
                    "pngparse"):
        blob = bytes(rng.integers(0, 256, 700, np.uint8))
        _feed(factory, blob)     # must not hang or crash
