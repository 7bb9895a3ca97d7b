"""Fused 4:2:0 chroma Pallas kernel (ops/chroma420_kernel.py): bit-parity
vs the numpy reference pipeline, via the Pallas interpreter on CPU.

The kernel replaces the XLA phase-split chroma path on TPU (converter
`_pipeline_chroma_kernel`); these tests pin its integer arithmetic
(video-chroma.c up2 filters + video-scaler.c S16 tap rounding) exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gstreamer_tpu.video.converter import VideoConverter
from gstreamer_tpu.video.info import VideoInfo


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("GTPU_PALLAS_CHROMA", "interpret")


@pytest.mark.parametrize("cfg", [
    # (in_w, in_h, out_w, out_h, method, taps)
    (480, 270, 112, 112, "linear", 2),      # headline shape /4
    (64, 48, 32, 24, "cubic", 0),
    (130, 62, 100, 40, "lanczos", 0),
    (256, 128, 64, 256, "linear", 0),       # vertical upscale branch
])
def test_chroma_kernel_parity_i420_rgb(cfg):
    w, h, ow, oh, method, taps = cfg
    ii = VideoInfo(format="I420", width=w, height=h)
    oi = VideoInfo(format="RGB", width=ow, height=oh)
    conv = VideoConverter(ii, oi, {"resampler-method": method,
                                   "resampler-taps": taps})
    rng = np.random.default_rng(42)
    planes = tuple(rng.integers(0, 256, (2,) + s, dtype=np.uint8)
                   for s in ii.plane_shapes())
    gold = conv.convert_ref(planes)
    dev = jax.jit(conv.trace_fn())(tuple(jnp.asarray(p) for p in planes))
    for g, d in zip(gold, dev):
        assert np.array_equal(np.asarray(g, np.int64),
                              np.asarray(d, np.int64))


def test_chroma_kernel_parity_i420_i420_downscale():
    # output stays 4:2:0 -> exercises the downsample stage after the kernel
    ii = VideoInfo(format="I420", width=192, height=108)
    oi = VideoInfo(format="I420", width=96, height=54)
    conv = VideoConverter(ii, oi)
    rng = np.random.default_rng(7)
    planes = tuple(rng.integers(0, 256, (2,) + s, dtype=np.uint8)
                   for s in ii.plane_shapes())
    gold = conv.convert_ref(planes)
    dev = jax.jit(conv.trace_fn())(tuple(jnp.asarray(p) for p in planes))
    for g, d in zip(gold, dev):
        assert np.array_equal(np.asarray(g, np.int64),
                              np.asarray(d, np.int64))
