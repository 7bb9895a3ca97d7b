"""Compositor banded-assembly correctness: overlapping pads, mixed
alphas, partial background visibility — compared against a sequential
numpy gold implementing the reference blend order
(gst-plugins-base/gst/compositor/blend.c:247 PLANAR_YUV_BLEND,
compositororc.orc:20 blend_u8: d = (d*256 + (s-d)*a) >> 8)."""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State


def _gold_blend_u8(dst, src, a256):
    d = dst.astype(np.int32)
    s = src.astype(np.int32)
    return np.clip((d * 256 + (s - d) * a256) >> 8, 0, 255).astype(np.uint8)


def _run_compositor(pads, out_w, out_h, background="black"):
    """pads: list of (xpos, ypos, w, h, alpha, fill_y)."""
    desc = (f"compositor name=c background={background} "
            + " ".join(
                f"sink_{k}::xpos={x} sink_{k}::ypos={y} "
                + (f"sink_{k}::alpha={a} " if a != 1.0 else "")
                for k, (x, y, _w, _h, a, _f) in enumerate(pads))
            + f"! video/x-raw,format=I420,width={out_w},height={out_h} "
            "! appsink name=o "
            + " ".join(
                f"appsrc name=in{k} caps=video/x-raw,format=I420,"
                f"width={w},height={h},framerate=30/1 ! c.sink_{k}"
                for k, (_x, _y, w, h, _a, _f) in enumerate(pads)))
    p = parse_launch(desc)
    for k, (_x, _y, w, h, _a, fill) in enumerate(pads):
        y_p = np.full((1, h, w), fill, np.uint8)
        u_p = np.full((1, h // 2, w // 2), 128, np.uint8)
        v_p = np.full((1, h // 2, w // 2), 128, np.uint8)
        p.get_by_name(f"in{k}").push_buffer(
            Buffer(data=(y_p, u_p, v_p), pts=0, duration=33333333,
                   batch=1))
        p.get_by_name(f"in{k}").end_of_stream()
    p.set_state(State.PLAYING)
    p.run()
    s = p.get_by_name("o").pull_sample()
    return np.asarray(s.buffer.data[0])[0]


def _gold(pads, out_w, out_h):
    acc = np.full((out_h, out_w), 16, np.uint8)  # black luma
    for (x, y, w, h, a, fill) in pads:
        w = min(w, out_w - x)
        h = min(h, out_h - y)
        src = np.full((h, w), fill, np.uint8)
        if a == 1.0:
            acc[y:y + h, x:x + w] = src
        else:
            a256 = max(0, min(255, int(a * 255)))
            acc[y:y + h, x:x + w] = _gold_blend_u8(
                acc[y:y + h, x:x + w], src, a256)
    return acc


class TestBandedCompositor:
    def test_overlapping_alpha_stack(self):
        pads = [
            (0, 0, 64, 48, 1.0, 200),      # opaque base
            (32, 16, 64, 48, 0.5, 100),    # half-alpha overlapping
            (16, 32, 32, 32, 0.25, 50),    # quarter-alpha on both
        ]
        got = _run_compositor(pads, 128, 96)
        want = _gold(pads, 128, 96)
        np.testing.assert_array_equal(got, want)

    def test_pad_clipped_by_output_edge(self):
        pads = [(100, 70, 64, 48, 1.0, 180)]  # spills past 128x96
        got = _run_compositor(pads, 128, 96)
        want = _gold(pads, 128, 96)
        np.testing.assert_array_equal(got, want)

    def test_background_only_regions(self):
        pads = [(48, 32, 16, 16, 0.75, 240)]
        got = _run_compositor(pads, 128, 96)
        want = _gold(pads, 128, 96)
        np.testing.assert_array_equal(got, want)
        # corners are pure background
        assert got[0, 0] == 16 and got[-1, -1] == 16

    def test_full_cover_single_pad(self):
        pads = [(0, 0, 128, 96, 1.0, 77)]
        got = _run_compositor(pads, 128, 96)
        assert (got == 77).all()
