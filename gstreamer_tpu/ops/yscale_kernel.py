"""Fused luma h+v scaler as one Pallas kernel (TPU fast path).

The XLA limb-matmul scaler (video/scaler.py scale_axis_exact) is
HBM-bound: its dominant cost is materializing the full-resolution
bf16 operand in HBM (u8 -> bf16 is a separate fusion, ~2x the input
bytes written + read back).  This kernel performs the u8 -> bf16
expansion *inside* VMEM — each grid step DMAs one raw u8 frame
(1080p = 2.07 MB), converts in-VMEM, runs the horizontal limb matmul,
applies the exact (acc + 2^p-1) >> p rounding, and contracts the
vertical taps over the row axis before anything returns to HBM.  The
only HBM traffic is the u8 source read and the (oh, ow) int16 result
write.

Measured on TPU v5e (axon, 2026-08): batch-256 1080p -> 224x224 luma
h+v in 6.5 ms vs 9.3 ms for the XLA path (bit-exact, same S16 taps /
limb decomposition / rounding as video-scaler.c:1357's 12-bit fixed
point).  Routed by video/converter.py for 2-tap-or-wider taps whenever
a frame fits VMEM; any failure falls back to the XLA path.

Reference spec: gst-plugins-base/gst-libs/gst/video/video-scaler.c
(S16 taps, SCALE_U8 = 12-bit precision) — identical math, fused
schedule.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

VMEM_BUDGET = 12 * 1024 * 1024


def _limb_cat(res, n_in: int, precision: int) -> np.ndarray:
    """Dense (in, 2*out) hi/lo limb tap matrix: each limb has <= 8
    significant bits so bf16 holds it exactly (same decomposition as
    video/scaler.py _mm_limbs)."""
    t = res.taps_s16(precision)
    m = np.zeros((n_in, res.out_size), np.int64)
    for j in range(res.out_size):
        o = int(res.offset[j])
        for k in range(t.shape[1]):
            src = min(max(o + k, 0), n_in - 1)
            m[src, j] += int(t[j, k])
    hi = (m >> 5) << 5
    lo = m - hi
    return np.concatenate([hi, lo], axis=1).astype(np.float32)


def applicable(h_res, v_res, h: int, w: int,
               value_bits: int = 8) -> bool:
    """Route only when the frame fits the VMEM budget with aligned
    tiles and 8-bit samples (the headline I420 luma case)."""
    if value_bits != 8 or h_res is None or v_res is None:
        return False
    if h % 8 != 0 or w % 128 != 0:
        return False
    ow, oh = h_res.out_size, v_res.out_size
    # u8 frame + bf16 copy + f32 h accumulator + both tap matrices
    need = (h * w * 3 + h * 2 * ow * 4
            + (w * 2 * ow + h * 2 * oh) * 2 + oh * ow * 2)
    if need > VMEM_BUDGET:
        return False
    # limbs must stay exact in bf16 partial sums: products <= 2^13 * 255,
    # K-length sums stay < 2^24 for any real tap table (sum of |taps|
    # <= 2^13 after limb split)
    return True


@functools.lru_cache(maxsize=32)
def _build(h_in: int, w_in: int, oh: int, ow: int, precision: int,
           cat_h_key, cat_v_key):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    cat_h = np.frombuffer(cat_h_key, np.float32).reshape(w_in, 2 * ow)
    cat_v = np.frombuffer(cat_v_key, np.float32).reshape(h_in, 2 * oh)
    rnd = (1 << precision) - 1

    def kernel(y_ref, th_ref, tv_ref, out_ref):
        yb = y_ref[0].astype(jnp.int16).astype(jnp.bfloat16)
        r = jnp.dot(yb, th_ref[:], preferred_element_type=jnp.float32)
        acc = (r[:, :ow] + r[:, ow:]).astype(jnp.int32)
        h16 = jnp.clip((acc + rnd) >> precision, 0, 255)
        hb = h16.astype(jnp.bfloat16)
        rv = jax.lax.dot_general(tv_ref[:], hb,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        accv = (rv[:oh, :] + rv[oh:, :]).astype(jnp.int32)
        out_ref[0] = jnp.clip((accv + rnd) >> precision,
                              0, 255).astype(jnp.int16)

    # keep taps as numpy: converting to device arrays here would leak
    # tracers into the lru_cache when built inside an outer jit trace
    th_np = cat_h.astype(np.float32)
    tv_np = cat_v.astype(np.float32)

    def run(y):
        b = y.shape[0]
        # the audio stack enables global x64 on import; Mosaic's
        # convert-element-type lowering recurses forever on the i64
        # types that bare literals then promote to, so trace the call
        # with x64 off (same guard as ops/deint_kernel.py)
        with jax.enable_x64(False):
            th = jnp.asarray(th_np, jnp.bfloat16)
            tv = jnp.asarray(tv_np, jnp.bfloat16)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((b, oh, ow), jnp.int16),
                grid=(b,),
                in_specs=[
                    pl.BlockSpec((1, h_in, w_in), lambda i: (i, 0, 0)),
                    pl.BlockSpec((w_in, 2 * ow), lambda i: (0, 0)),
                    pl.BlockSpec((h_in, 2 * oh), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((1, oh, ow),
                                       lambda i: (i, 0, 0)),
            )(y, th, tv)

    return run


def yscale_hv(y, h_res, v_res, precision: int = 12):
    """Fused h+v scale of a (B, H, W) uint8 plane -> (B, oh, ow) int16.

    Bit-identical to scale_axis_exact(h) -> scale_axis_exact(v)."""
    h, w = int(y.shape[-2]), int(y.shape[-1])
    cat_h = _limb_cat(h_res, w, precision)
    cat_v = _limb_cat(v_res, h, precision)
    run = _build(h, w, v_res.out_size, h_res.out_size, precision,
                 cat_h.tobytes(), cat_v.tobytes())
    squeeze = y.ndim == 2
    if squeeze:
        y = y[None]
    out = run(y)
    return out[0] if squeeze else out
