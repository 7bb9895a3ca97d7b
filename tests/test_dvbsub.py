"""DVB subtitles (gstdvbsubenc.c / dvb-sub.c): 4-bit pixel code
strings, display-set roundtrip, overlay blending."""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.elements.dvbsub import (_encode_4bit_row,
                                           decode_4bit_string,
                                           decode_display_set,
                                           encode_display_set)


def test_4bit_rle_roundtrip():
    rng = np.random.default_rng(0)
    rows = [
        np.zeros(64, np.uint8),
        np.full(64, 5, np.uint8),
        np.array([0, 0, 1, 1, 1, 1, 2] * 9 + [3], np.uint8),
        rng.integers(0, 16, 301).astype(np.uint8),
        np.array([7], np.uint8),
    ]
    for row in rows:
        blob = _encode_4bit_row(row)
        got, used = decode_4bit_string(blob, len(row))
        assert used <= len(blob)
        assert np.array_equal(got, row), row[:16]


def test_display_set_roundtrip():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 4, (20, 48)).astype(np.uint8)
    palette = [(0, 16, 128, 128), (255, 235, 128, 128),
               (255, 16, 128, 128), (200, 145, 54, 34)]
    blob = encode_display_set(idx, palette, x=100, y=50)
    out = decode_display_set(blob)
    assert out is not None
    assert (out["x"], out["y"]) == (100, 50)
    assert np.array_equal(out["indices"], idx)
    img = out["image"]
    for k, (a, y, cb, cr) in enumerate(palette):
        m = idx == k
        if m.any():
            assert np.all(img[m] == (a, y, cb, cr))


def test_enc_overlay_elements():
    enc = element_factory_make("dvbsubenc", x=8, y=4)
    ayuv = np.zeros((4, 10, 24), np.uint8)
    ayuv[0, 2:8, 4:20] = 255       # opaque rect
    ayuv[1, 2:8, 4:20] = 220
    ayuv[2:] = 128
    sub = enc.host_process(Buffer(data=ayuv[None], batch=1))
    assert sub is not None

    ov = element_factory_make("dvbsuboverlay")
    video = Buffer(data=(np.zeros((1, 32, 48), np.uint8),
                         np.full((1, 16, 24), 128, np.uint8),
                         np.full((1, 16, 24), 128, np.uint8)),
                   batch=1)
    out = ov.host_aggregate({"video": video, "text": sub})
    Y = np.asarray(out.data[0])[0]
    assert Y[4 + 3, 8 + 10] == 220     # inside the subtitle rect
    assert Y[0, 0] == 0                # untouched background
