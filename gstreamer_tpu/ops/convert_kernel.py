"""Pallas fused ingest kernel: I420 unpack + chroma upsample + h-scale.

The hot half of the 1080p convert+scale pipeline is pure data movement
(unpack duplication + the 2x chroma filters produce ~50MB of HBM
intermediates per frame when expressed as XLA ops).  This kernel performs

    unpack (nearest dup)  ->  chroma up2 H (cosited or interstitial)
    ->  chroma up2 V (interstitial)  ->  horizontal scale (exact
    bf16-limb MXU matmuls, SCALE_U8 fixed point)

in ONE pass over row tiles held in VMEM, writing only the (H, out_w)
per-channel results.  Arithmetic is bit-identical to the XLA path (and to
the reference ORC kernels):

* up2 H cosited: even = c[k], odd = (c[k] + c[k+1] + 1) >> 1
* up2 H interstitial: out[2k] = (c[k-1] + 3c[k] + 2) >> 2,
                      out[2k+1] = (3c[k] + c[k+1] + 2) >> 2
* up2 V interstitial: same filter over rows
* h-scale: clamp_u8((sum taps_s16 * px + 4095) >> 12) as two bf16
  matmuls over hi/lo tap limbs with f32 accumulation (exact for 8-bit
  pixels x 13-bit taps)

Mosaic-friendly structure: the full-width chroma row is never
materialized — even and odd columns are kept as separate half-width
arrays and contracted against the even/odd ROWS of the tap matrix
(mathematically identical because the contraction sum splits by column
parity before the fixed-point rounding); only OUTPUT rows are
interleaved, via a leading-dimension reshape.

Grid: (batch, H / TILE_ROWS).  Y arrives via a blocked BlockSpec; the
subsampled chroma planes stay in HBM and each step DMAs its tile + 1-row
halo (top/bottom padded by the caller), following the async-copy pattern
from the Pallas guide.
"""

from __future__ import annotations

import numpy as np

TILE_ROWS = 64          # output rows per grid step (sublane-aligned);
                        # inputs are edge-padded to a multiple


def _limbs(m: np.ndarray):
    """Split a dense s16 tap matrix into exact bf16 hi/lo limbs (each
    <=8 significant bits)."""
    hi = (m >> 5) << 5
    lo = m - hi
    return hi.astype(np.float32), lo.astype(np.float32)


def fused_i420_up_hscale(y, u, v, tap_matrix: np.ndarray,
                         tap_matrix_half, h_cosited: bool,
                         interpret: bool = False):
    """y: (B, H, W); u, v: (B, H/2, W/2) uint8; tap_matrix: (out_w, W) s16.

    Returns (Y, U_even, U_odd, V_even, V_odd): Y is (B, H, out_w) int16;
    the chroma planes are (B, H/2, out_w) carrying the even/odd full-res
    rows separately (recombined by the caller — either interleaved in XLA
    or folded into the v-scale contraction)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W = y.shape
    WC = u.shape[-1]
    out_w = tap_matrix.shape[0]
    # edge-pad the height to a tile multiple (sliced off after the call;
    # the tc+2 chroma DMA window stays in range thanks to the padding)
    H_pad = -(-H // TILE_ROWS) * TILE_ROWS
    if H_pad != H:
        import jax.numpy as _jnp
        pad_y = H_pad - H
        y = _jnp.concatenate(
            [y] + [y[:, -1:]] * pad_y, axis=1)
        pad_c = H_pad // 2 - u.shape[1]
        u = _jnp.concatenate([u] + [u[:, -1:]] * pad_c, axis=1)
        v = _jnp.concatenate([v] + [v[:, -1:]] * pad_c, axis=1)
    n_tiles = H_pad // TILE_ROWS
    tc = TILE_ROWS // 2          # chroma rows advanced per tile

    # chroma width padded to the lane tiling (128); the padded tap rows
    # are ZERO so junk columns cannot contribute
    WCP = -(-WC // 128) * 128

    t_hi, t_lo = _limbs(tap_matrix)                  # (out_w, W)
    t_hi_j = jnp.asarray(t_hi.T, jnp.bfloat16)       # (W, out_w)
    t_lo_j = jnp.asarray(t_lo.T, jnp.bfloat16)

    def _pad_rows(m):
        out = np.zeros((WCP, out_w), m.dtype)
        out[:m.shape[0]] = m
        return jnp.asarray(out, jnp.bfloat16)

    # even/odd column rows of the tap matrix (for the split contraction)
    te_hi = _pad_rows(t_hi.T[0::2])                  # (WCP, out_w)
    te_lo = _pad_rows(t_lo.T[0::2])
    to_hi = _pad_rows(t_hi.T[1::2])
    to_lo = _pad_rows(t_lo.T[1::2])

    # pad chroma: 1 edge row on top (v-filter halo) and 7 on the bottom
    # (DMA lengths must be sublane-aligned, so each step copies tc+8 rows);
    # columns edge-padded to the lane tiling
    def _pad_c(c):
        c = jnp.concatenate([c[:, :1], c] + [c[:, -1:]] * 7, axis=1)
        if WCP != WC:
            c = jnp.concatenate(
                [c, jnp.repeat(c[:, :, -1:], WCP - WC, axis=2)], axis=2)
        return c

    upad = _pad_c(u)
    vpad = _pad_c(v)

    def kernel(y_ref, u_hbm, v_hbm, thi_ref, tlo_ref,
               tehi_ref, telo_ref, tohi_ref, tolo_ref,
               oy_ref, oue_ref, ouo_ref, ove_ref, ovo_ref, usc, vsc, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)

        cu = pltpu.make_async_copy(
            u_hbm.at[b, pl.ds(i * tc, tc + 8)], usc.at[:tc + 8], sem.at[0])
        cv = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(i * tc, tc + 8)], vsc.at[:tc + 8], sem.at[1])
        cu.start()
        cv.start()

        def to_bf16(x):
            # Mosaic lacks direct u8/i16 -> bf16 casts; go via i32/f32
            return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

        def scale_out(acc_f32):
            acc = acc_f32.astype(jnp.int32)
            return jnp.clip((acc + 4095) >> 12, 0, 255).astype(jnp.int16)

        # Y: full-width matmul while chroma DMA is in flight
        yb = to_bf16(y_ref[0])
        acc = (jnp.dot(yb, thi_ref[:], preferred_element_type=jnp.float32)
               + jnp.dot(yb, tlo_ref[:], preferred_element_type=jnp.float32))
        oy_ref[0] = scale_out(acc)

        cu.wait()
        cv.wait()

        def chroma_channel(csc, out_e_ref, out_o_ref):
            c = csc[:tc + 2].astype(jnp.int32)       # chroma rows k-1..k+tc
            cn = jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1)   # c[k+1]
            if h_cosited:
                ec = c                               # even columns
                oc = (c + cn + 1) >> 1               # odd columns
            else:
                cp = jnp.concatenate([c[:, :1], c[:, :-1]], axis=1)
                ec = (cp + 3 * c + 2) >> 2
                oc = (3 * c + cn + 2) >> 2

            def vfilt(x):
                prev, cur, nxt = x[0:tc], x[1:tc + 1], x[2:tc + 2]
                even_r = (prev + 3 * cur + 2) >> 2   # full-res rows 2k
                odd_r = (3 * cur + nxt + 2) >> 2     # rows 2k+1
                return even_r, odd_r

            ec_e, ec_o = vfilt(ec)
            oc_e, oc_o = vfilt(oc)

            def hscale(e_half, o_half):
                eb = to_bf16(e_half)
                ob = to_bf16(o_half)
                return (
                    jnp.dot(eb, tehi_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(eb, telo_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(ob, tohi_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(ob, tolo_ref[:], preferred_element_type=jnp.float32))

            out_e_ref[0] = scale_out(hscale(ec_e, oc_e))   # rows 2k
            out_o_ref[0] = scale_out(hscale(ec_o, oc_o))   # rows 2k+1

        chroma_channel(usc, oue_ref, ouo_ref)
        chroma_channel(vsc, ove_ref, ovo_ref)

    grid = (B, n_tiles)
    # outputs: Y (interleaved rows via its BlockSpec) + per-parity chroma
    # row planes (interleaving is folded into the downstream v-scale
    # contraction — Mosaic cannot materialize minor-dim interleaves)
    out_shape = (
        jax.ShapeDtypeStruct((B, H_pad, out_w), jnp.int16),
        jax.ShapeDtypeStruct((B, H_pad // 2, out_w), jnp.int16),
        jax.ShapeDtypeStruct((B, H_pad // 2, out_w), jnp.int16),
        jax.ShapeDtypeStruct((B, H_pad // 2, out_w), jnp.int16),
        jax.ShapeDtypeStruct((B, H_pad // 2, out_w), jnp.int16),
    )
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_ROWS, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((W, out_w), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, out_w), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WCP, out_w), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WCP, out_w), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WCP, out_w), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WCP, out_w), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_ROWS, out_w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec((1, TILE_ROWS // 2, out_w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tc + 8, WCP), jnp.uint8),
            pltpu.VMEM((tc + 8, WCP), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(y.astype(jnp.uint8), upad.astype(jnp.uint8), vpad.astype(jnp.uint8),
      t_hi_j, t_lo_j, te_hi, te_lo, to_hi, to_lo)
    if H_pad != H:
        res = (res[0][:, :H], res[1][:, :H // 2], res[2][:, :H // 2],
               res[3][:, :H // 2], res[4][:, :H // 2])
    return res


def applicable(ifmt, ii, oi, plan) -> bool:
    """The fused kernel covers: 8-bit 4:2:0 input, vertical interstitial +
    horizontal cosited-or-not chroma, downscale with scale-before-matrix,
    height divisible by the tile."""
    return (
        ifmt.bits == 8
        and ifmt.w_sub[1] == 1 and ifmt.h_sub[1] == 1
        and plan.get("upsample")
        and not plan.get("up_v_cosited")
        and plan.get("scale_before_matrix")
        and plan.get("h_res") is not None
        and ii.height % 2 == 0
        and ii.width % 2 == 0)
