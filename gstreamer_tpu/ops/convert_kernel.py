"""Pallas fused ingest kernel: I420 unpack + chroma upsample + h-scale.

The hot half of the 1080p convert+scale pipeline is pure data movement
(unpack duplication + the 2x chroma filters produce ~50MB of HBM
intermediates per frame when expressed as XLA ops).  This kernel performs

    unpack (nearest dup)  ->  chroma up2 H (cosited or interstitial)
    ->  chroma up2 V (interstitial)  ->  horizontal scale (exact
    bf16-limb MXU matmuls, SCALE_U8 fixed point)

in ONE pass over row tiles held in VMEM, writing only the scaled
channels.  Arithmetic is bit-identical to the XLA path (and to the
reference ORC kernels):

* up2 H cosited: even = c[k], odd = (c[k] + c[k+1] + 1) >> 1
* up2 H interstitial: out[2k] = (c[k-1] + 3c[k] + 2) >> 2,
                      out[2k+1] = (3c[k] + c[k+1] + 2) >> 2
* up2 V interstitial: same filter over rows (applied AFTER the h filter,
  matching MAKE_UPSAMPLE_V2 which h-resamples each line first)
* h-scale: clamp_u8((sum taps_s16 * px + 4095) >> 12) as two bf16
  matmuls over hi/lo tap limbs with f32 accumulation (exact for 8-bit
  pixels x 13-bit taps)

Mosaic-friendly structure:
* the full-width chroma row is never materialized — even and odd
  columns stay as half-width arrays contracted against the even/odd
  ROWS of the tap matrix (exact: the contraction sum splits by column
  parity before the fixed-point rounding);
* chroma outputs are even/odd ROW parity planes — the interleave is
  folded into the downstream v-scale contraction (or done in XLA);
* the v-filter halo comes from three SHIFTED chroma views (k-1, k, k+1)
  fed through ordinary BlockSpecs, so the Pallas pipeline machinery
  double-buffers every load automatically (no manual DMA);
* geometry is padded to sublane/lane tilings (padded tap rows are zero,
  padded output rows are sliced off).

Grid: (batch, H / tile).
"""

from __future__ import annotations

import numpy as np

TILE_ROWS = 128         # output rows per grid step (tc=64 keeps chroma
                        # blocks sublane-aligned); height pads to a multiple


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
    tile = TILE_ROWS
    H_pad = -(-H // tile) * tile
    tc = tile // 2
    if H_pad != H:
        y = jnp.concatenate(
            [y, jnp.repeat(y[:, -1:], H_pad - H, axis=1)], axis=1)
        padc = H_pad // 2 - u.shape[1]
        u = jnp.concatenate([u, jnp.repeat(u[:, -1:], padc, axis=1)], axis=1)
        v = jnp.concatenate([v, jnp.repeat(v[:, -1:], padc, axis=1)], axis=1)
    n_tiles = H_pad // tile
    HC = H_pad // 2

    # lane-align chroma width; padded tap rows are ZERO so junk columns
    # cannot contribute
    WCP = -(-WC // 128) * 128

    t_hi, t_lo = _limbs(tap_matrix)                  # (out_w, W)
    t_hi_j = jnp.asarray(t_hi.T, jnp.bfloat16)       # (W, out_w)
    t_lo_j = jnp.asarray(t_lo.T, jnp.bfloat16)

    def _pad_rows(m):
        out = np.zeros((WCP, out_w), m.dtype)
        out[:m.shape[0]] = m
        return jnp.asarray(out, jnp.bfloat16)

    te_hi = _pad_rows(t_hi.T[0::2])                  # (WCP, out_w)
    te_lo = _pad_rows(t_lo.T[0::2])
    to_hi = _pad_rows(t_hi.T[1::2])
    to_lo = _pad_rows(t_lo.T[1::2])

    def _wpad(c):
        if WCP != WC:
            c = jnp.concatenate(
                [c, jnp.repeat(c[:, :, -1:], WCP - WC, axis=2)], axis=2)
        return c

    def _shifted(c):
        """(prev, cur, next) row views with edge clamp."""
        prev = jnp.concatenate([c[:, :1], c[:, :-1]], axis=1)
        nxt = jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1)
        return _wpad(prev), _wpad(c), _wpad(nxt)

    up_, uc_, un_ = _shifted(u)
    vp_, vc_, vn_ = _shifted(v)

    def kernel(y_ref, upr, ucr, unr, vpr, vcr, vnr,
               thi_ref, tlo_ref, tehi_ref, telo_ref, tohi_ref, tolo_ref,
               oy_ref, oue_ref, ouo_ref, ove_ref, ovo_ref):

        def to_bf16(x):
            # Mosaic lacks direct u8/i16 -> bf16 casts; go via i32/f32
            return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

        def scale_out(acc_f32):
            acc = acc_f32.astype(jnp.int32)
            return jnp.clip((acc + 4095) >> 12, 0, 255).astype(jnp.int16)

        yb = to_bf16(y_ref[0])
        acc = (jnp.dot(yb, thi_ref[:], preferred_element_type=jnp.float32)
               + jnp.dot(yb, tlo_ref[:], preferred_element_type=jnp.float32))
        oy_ref[0] = scale_out(acc)

        def h_up(c):
            """int32 (rows, WCP) half-res -> (even, odd) column halves."""
            cn = jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1)
            if h_cosited:
                return c, (c + cn + 1) >> 1
            cp = jnp.concatenate([c[:, :1], c[:, :-1]], axis=1)
            return (cp + 3 * c + 2) >> 2, (3 * c + cn + 2) >> 2

        def chroma_channel(p_ref, c_ref, n_ref, out_e_ref, out_o_ref):
            # h filter FIRST (reference order), per shifted row view
            pe, po = h_up(p_ref[0].astype(jnp.int32))
            ce, co = h_up(c_ref[0].astype(jnp.int32))
            ne, no = h_up(n_ref[0].astype(jnp.int32))
            # v filter per column-parity half:
            #   even rows 2k: (h[k-1] + 3h[k] + 2) >> 2
            #   odd rows 2k+1: (3h[k] + h[k+1] + 2) >> 2
            er_ec = (pe + 3 * ce + 2) >> 2
            er_oc = (po + 3 * co + 2) >> 2
            orr_ec = (3 * ce + ne + 2) >> 2
            orr_oc = (3 * co + no + 2) >> 2

            def hscale(e_half, o_half):
                eb = to_bf16(e_half)
                ob = to_bf16(o_half)
                return (
                    jnp.dot(eb, tehi_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(eb, telo_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(ob, tohi_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(ob, tolo_ref[:], preferred_element_type=jnp.float32))

            out_e_ref[0] = scale_out(hscale(er_ec, er_oc))
            out_o_ref[0] = scale_out(hscale(orr_ec, orr_oc))

        chroma_channel(upr, ucr, unr, oue_ref, ouo_ref)
        chroma_channel(vpr, vcr, vnr, ove_ref, ovo_ref)

    grid = (B, n_tiles)
    cspec = pl.BlockSpec((1, tc, WCP), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    tspec_full = pl.BlockSpec((W, out_w), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)
    tspec_half = pl.BlockSpec((WCP, out_w), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((B, H_pad, out_w), jnp.int16),
        jax.ShapeDtypeStruct((B, HC, out_w), jnp.int16),
        jax.ShapeDtypeStruct((B, HC, out_w), jnp.int16),
        jax.ShapeDtypeStruct((B, HC, out_w), jnp.int16),
        jax.ShapeDtypeStruct((B, HC, out_w), jnp.int16),
    )
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            cspec, cspec, cspec, cspec, cspec, cspec,
            tspec_full, tspec_full,
            tspec_half, tspec_half, tspec_half, tspec_half,
        ],
        out_specs=(
            pl.BlockSpec((1, tile, out_w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec((1, tc, out_w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=out_shape,
        interpret=interpret,
    )(y.astype(jnp.uint8),
      up_.astype(jnp.uint8), uc_.astype(jnp.uint8), un_.astype(jnp.uint8),
      vp_.astype(jnp.uint8), vc_.astype(jnp.uint8), vn_.astype(jnp.uint8),
      t_hi_j, t_lo_j, te_hi, te_lo, to_hi, to_lo)
    if H_pad != H:
        res = (res[0][:, :H], res[1][:, :H // 2], res[2][:, :H // 2],
               res[3][:, :H // 2], res[4][:, :H // 2])
    return res


def applicable(ifmt, ii, oi, plan) -> bool:
    """The fused kernel covers: 8-bit 4:2:0 input, vertical interstitial +
    horizontal cosited-or-not chroma, downscale with scale-before-matrix."""
    return (
        ifmt.bits == 8
        and ifmt.w_sub[1] == 1 and ifmt.h_sub[1] == 1
        and plan.get("upsample")
        and not plan.get("up_v_cosited")
        and plan.get("scale_before_matrix")
        and plan.get("h_res") is not None
        and ii.height % 2 == 0
        and ii.width % 2 == 0)
