"""2-tap 4:2:0 chroma fast path: static-gather formulation (pure XLA).

For 2-tap scalers (videoscale's default method=linear taps=2,
gstvideoconvertscale.c:1000-1005) every output sample reads two
CONSECUTIVE full-res samples — one even-phase, one odd-phase — so the
whole upsample+scale chain reduces to static column/row gathers plus
weighted adds, with no matmul and no full-resolution intermediates:

    raw u8 plane
    -> gather the 2-4 needed column sets (the up2 h-filter evaluated
       only at the gathered columns: selection commutes with the
       per-column filters and happens before any rounding)
    -> vertical up2 phase filters on the narrow arrays
    -> h weighted sum + (acc+4095)>>12 (video-orc resample rounding)
    -> row gathers + v weighted sum + rounding

Bit-exact to up2_phases -> scale_cols_split_exact ->
scale_rows_split_exact; runs on any backend (no Pallas).  Measured on
TPU v5e at the headline config: 7.5 ms/batch-256 for both chroma planes
vs 10.4 ms for the dense-tap Pallas kernel (the dense kernel remains
the fallback for >2-tap methods).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _split_2tap(res):
    """Per-output (even_idx, odd_idx, even_tap, odd_tap): a 2-tap filter
    reads full-res samples o and o+1 — one even, one odd."""
    o = res.offset
    t = res.taps_s16()
    ie = np.where(o % 2 == 0, o // 2, (o + 1) // 2).astype(np.int64)
    io = np.where(o % 2 == 0, o // 2, (o - 1) // 2).astype(np.int64)
    te = np.where(o % 2 == 0, t[:, 0], t[:, 1]).astype(np.int32)
    to = np.where(o % 2 == 0, t[:, 1], t[:, 0]).astype(np.int32)
    return ie, io, te, to


def applicable(h_res, v_res, cw: int, ch: int) -> bool:
    return (h_res is not None and v_res is not None
            and h_res.max_taps == 2 and v_res.max_taps == 2
            and h_res.out_size <= 2 * cw and v_res.out_size <= 2 * ch)


def chroma420_scale_2tap(xp, c, h_res, v_res, h_cosited: bool,
                         v_cosited: bool):
    """c: (..., ch, cw) uint8/int half-res chroma -> (..., OH, OW) int32."""
    ICE, ICO, TCE, TCO = _split_2tap(h_res)
    IRE, IRO, TRE, TRO = _split_2tap(v_res)
    cw = c.shape[-1]

    ci = c.astype(xp.int16)
    if h_cosited:
        # ce == c; co[i] = (c[i] + c[i+1] + 1) >> 1
        ceg = ci[..., ICE]
        cog = (ci[..., ICO] + ci[..., np.minimum(ICO + 1, cw - 1)]
               + 1) >> 1
    else:
        # ce[i] = (c[i-1] + 3c[i] + 2) >> 2; co[i] = (3c[i] + c[i+1] + 2) >> 2
        ceg = (ci[..., np.maximum(ICE - 1, 0)] + 3 * ci[..., ICE]
               + 2) >> 2
        cog = (3 * ci[..., ICO] + ci[..., np.minimum(ICO + 1, cw - 1)]
               + 2) >> 2

    from ..video import chroma as chroma_mod

    ceg_re, ceg_ro = chroma_mod.up2_phases(xp, ceg, -2, v_cosited)
    cog_re, cog_ro = chroma_mod.up2_phases(xp, cog, -2, v_cosited)

    tce = TCE[None, None] if c.ndim >= 3 else TCE[None]
    tco = TCO[None, None] if c.ndim >= 3 else TCO[None]

    def hsum(a, b):
        acc = tce * a.astype(xp.int32) + tco * b.astype(xp.int32)
        return (xp.clip((acc + 4095) >> 12, 0, 255)).astype(xp.int16)

    h_re = hsum(ceg_re, cog_re)
    h_ro = hsum(ceg_ro, cog_ro)

    tre = TRE[:, None]
    tro = TRO[:, None]
    vre = h_re[..., IRE, :].astype(xp.int32)
    vro = h_ro[..., IRO, :].astype(xp.int32)
    acc = tre * vre + tro * vro
    return xp.clip((acc + 4095) >> 12, 0, 255)
