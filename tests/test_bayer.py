"""bayer2rgb / rgb2bayer tests: vectorized device path vs scalar gold,
pipeline integration, depth conversion."""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State
from gstreamer_tpu.elements.bayer import (demosaic_fn, demosaic_ref,
                                          parse_bayer_format)


def _run(fn, x):
    out = fn(x[None])
    return np.stack([np.asarray(p)[0] for p in out], axis=-1)


@pytest.mark.parametrize("pattern", ["bggr", "gbrg", "grbg", "rggb"])
def test_demosaic_vs_gold_8bit(pattern):
    rng = np.random.default_rng(hash(pattern) % 2**32)
    x = rng.integers(0, 256, (12, 16), dtype=np.uint8)
    fn = demosaic_fn(pattern, 8, False, 12, 16)
    got = _run(fn, x)
    gold = demosaic_ref(x, pattern)
    np.testing.assert_array_equal(got, gold)


@pytest.mark.parametrize("bpp,out16", [(10, True), (12, True), (16, True),
                                       (12, False), (8, True)])
def test_demosaic_depths(bpp, out16):
    rng = np.random.default_rng(bpp)
    hi = 1 << bpp
    dt = np.uint8 if bpp == 8 else np.uint16
    x = rng.integers(0, hi, (8, 10)).astype(dt)
    fn = demosaic_fn("rggb", bpp, out16, 8, 10)
    got = _run(fn, x)
    gold = demosaic_ref(x, "rggb", bpp, out16)
    np.testing.assert_array_equal(got, gold)
    assert got.dtype == (np.uint16 if out16 else np.uint8)


def test_demosaic_flat_field_exact():
    """A constant mosaic must demosaic to that constant everywhere."""
    for pattern in ("bggr", "grbg"):
        x = np.full((8, 8), 77, np.uint8)
        out = _run(demosaic_fn(pattern, 8, False, 8, 8), x)
        assert (out[..., :3] == 77).all() and (out[..., 3] == 255).all()


def test_bayer_pipeline():
    """appsrc(video/x-bayer) ! bayer2rgb ! videoconvert ! appsink."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (2, 16, 16), dtype=np.uint8)
    p = parse_launch(
        "appsrc name=in caps=video/x-bayer,format=grbg,width=16,height=16,"
        "framerate=30/1 ! bayer2rgb ! video/x-raw,format=RGBA ! "
        "videoconvert ! video/x-raw,format=I420 ! appsink name=s")
    p.get_by_name("in").push_buffer(Buffer(data=x, pts=0, batch=2))
    p.set_state(State.PLAYING)
    assert p.tick()
    out = p.get_by_name("s").pull_sample().buffer
    y = np.asarray(out.data[0])
    assert y.shape == (2, 16, 16)


def test_bayer_deep_pipeline_negotiates_rgba64():
    x = (np.arange(8 * 8, dtype=np.uint16).reshape(1, 8, 8) * 16) % 4096
    p = parse_launch(
        "appsrc name=in caps=video/x-bayer,format=rggb12le,width=8,"
        "height=8,framerate=30/1 ! bayer2rgb ! appsink name=s")
    p.get_by_name("in").push_buffer(Buffer(data=x.astype(np.uint16),
                                           pts=0, batch=1))
    p.set_state(State.PLAYING)
    assert p.tick()
    sink = p.get_by_name("s")
    assert sink.sink_pads()[0].caps[0]["format"] == "RGBA64_LE"
    planes = sink.pull_sample().buffer.data
    assert np.asarray(planes[0]).dtype == np.uint16


def test_rgb2bayer_roundtrip_flat():
    """Constant ARGB -> bayer -> RGB must reproduce the constant."""
    p = parse_launch(
        "appsrc name=in caps=video/x-raw,format=ARGB,width=8,height=8,"
        "framerate=30/1 ! rgb2bayer ! video/x-bayer,format=bggr ! "
        "bayer2rgb ! video/x-raw,format=RGBA ! appsink name=s")
    r = np.full((1, 8, 8), 10, np.uint8)
    g = np.full((1, 8, 8), 20, np.uint8)
    b = np.full((1, 8, 8), 30, np.uint8)
    a = np.full((1, 8, 8), 255, np.uint8)
    p.get_by_name("in").push_buffer(Buffer(data=(r, g, b, a), pts=0,
                                           batch=1))
    p.set_state(State.PLAYING)
    assert p.tick()
    out = p.get_by_name("s").pull_sample().buffer.data
    np.testing.assert_array_equal(np.asarray(out[0]), r)
    np.testing.assert_array_equal(np.asarray(out[1]), g)
    np.testing.assert_array_equal(np.asarray(out[2]), b)


def test_rgb2bayer_mosaic_positions():
    """Each mosaic position picks the right channel (gstrgb2bayer.c:317)."""
    from gstreamer_tpu.core.element import element_factory_make
    from gstreamer_tpu.core.caps import Caps
    e = element_factory_make("rgb2bayer")
    e.set_info(Caps.from_string(
        "video/x-raw, format=ARGB, width=4, height=4"),
        Caps.from_string("video/x-bayer, format=gbrg, width=4, height=4"))
    fn = e.make_fn()
    r = np.full((1, 4, 4), 1, np.uint8)
    g = np.full((1, 4, 4), 2, np.uint8)
    b = np.full((1, 4, 4), 3, np.uint8)
    a = np.zeros((1, 4, 4), np.uint8)
    out = np.asarray(fn((r, g, b, a)))[0]
    # gbrg: row0 = G B G B, row1 = R G R G
    np.testing.assert_array_equal(out[0], [2, 3, 2, 3])
    np.testing.assert_array_equal(out[1], [1, 2, 1, 2])


def test_parse_bayer_format():
    assert parse_bayer_format("bggr") == ("bggr", 8, False)
    assert parse_bayer_format("rggb12le") == ("rggb", 12, False)
    assert parse_bayer_format("grbg16be") == ("grbg", 16, True)
    with pytest.raises(ValueError):
        parse_bayer_format("abcd")
