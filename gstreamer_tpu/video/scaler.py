"""Separable video resampler: tap generation + exact fixed-point scaling.

TPU-native re-design of GstVideoResampler + GstVideoScaler
(subprojects/gst-plugins-base/gst-libs/gst/video/video-resampler.c — tap
formulas get_linear_tap :150, get_cubic_tap :166 (Mitchell B=C=1/3),
get_lanczos_tap :197, tap normalization + edge fold-in
resampler_calculate_taps :204; video-scaler.c — S16 tap quantization with
DC-exact bisection resampler_convert_coeff :339, SCALE_U8=12 :70,
offset_n layout make_s16_taps :389; application kernels
video_orc_resample_h_multaps_u8 / scaletaps_u8 in video-orc.orc:2356-2380:
out = clamp_u8((sum tap*u8 + 4095) >> 12)).

Taps are trace-time constants (numpy); application happens on device.  The
weighted sums are expressed as dense matmuls over the scaled axis so XLA
maps them onto the MXU — exact because all intermediates are integers far
below 2^24 (float32 mantissa), or int32 when requested.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

METHOD_NEAREST = "nearest"
METHOD_LINEAR = "linear"
METHOD_CUBIC = "cubic"
METHOD_SINC = "sinc"
METHOD_LANCZOS = "lanczos"

DEFAULT_CUBIC_B = 1.0 / 3.0
DEFAULT_CUBIC_C = 1.0 / 3.0
DEFAULT_ENVELOPE = 2.0
DEFAULT_SHARPNESS = 1.0
DEFAULT_SHARPEN = 0.0
DEFAULT_MAX_TAPS = 128

SCALE_U8 = 12                       # video-scaler.c:70
SCALE_ROUND_U8 = (1 << SCALE_U8) - 1   # the ORC kernel adds 4095 (orc:2373)


def _sinc(x: float) -> float:
    if x == 0:
        return 1.0
    return math.sin(math.pi * x) / (math.pi * x)


def _envelope(x: float) -> float:
    if x <= -1 or x >= 1:
        return 0.0
    return _sinc(x)


@dataclass
class Resampler:
    """Float taps (exact port of gst_video_resampler_init)."""

    in_size: int
    out_size: int
    max_taps: int
    offset: np.ndarray          # (out_size,) int32 — first source sample
    taps: np.ndarray            # (out_size, max_taps) float64

    # quantized view (filled lazily)
    _taps_s16: Optional[np.ndarray] = None

    def taps_s16(self, precision: int = SCALE_U8) -> np.ndarray:
        if self._taps_s16 is None:
            self._taps_s16 = np.stack(
                [convert_coeff(t, precision) for t in self.taps])
        return self._taps_s16


def make_resampler(method: str, in_size: int, out_size: int,
                   n_taps: int = 0, shift: float = 0.0,
                   cubic_b: float = DEFAULT_CUBIC_B,
                   cubic_c: float = DEFAULT_CUBIC_C,
                   envelope: float = DEFAULT_ENVELOPE,
                   sharpness: float = DEFAULT_SHARPNESS,
                   sharpen: float = DEFAULT_SHARPEN,
                   max_taps_opt: int = DEFAULT_MAX_TAPS,
                   half_taps: bool = False) -> Resampler:
    """gst_video_resampler_init (video-resampler.c:343)."""
    assert in_size > 0 and out_size > 0

    scale_factor = in_size / float(out_size)
    fx = (1.0 / scale_factor) * sharpness if scale_factor > 1.0 else 1.0 * sharpness

    n_taps = min(n_taps, max_taps_opt) if n_taps else 0

    if method == METHOD_NEAREST:
        env = envelope
        if n_taps == 0:
            n_taps = 1
    elif method == METHOD_LINEAR:
        env = 1.0
    elif method == METHOD_CUBIC:
        env = 2.0
    elif method in (METHOD_SINC, METHOD_LANCZOS):
        env = envelope
    else:
        raise ValueError(f"unknown resampler method {method!r}")

    if n_taps == 0:
        dx = math.ceil(2.0 * env / fx)
        n_taps = max(0, min(int(dx), max_taps_opt))
    if half_taps and n_taps > 3:
        # GST_VIDEO_RESAMPLER_FLAG_HALF_TAPS (video-resampler.c:414)
        n_taps //= 2
    fx = 2.0 * env / n_taps
    ex = 2.0 / n_taps

    if n_taps > in_size:
        n_taps = in_size

    max_taps = n_taps
    tap_offs = (max_taps - 1) // 2
    corr = 0.0 if max_taps == 1 else 0.5

    def get_tap(l: int, xi: int, x: float) -> float:
        xl = xi + l
        if method == METHOD_NEAREST:
            return 1.0
        if method == METHOD_LINEAR:
            a = abs(x - xl) * fx
            return 1.0 - a if a < 1.0 else 0.0
        if method == METHOD_CUBIC:
            a = abs(x - xl) * fx
            a2, a3 = a * a, a * a * a
            b, c = cubic_b, cubic_c
            if a <= 1.0:
                return ((12.0 - 9.0 * b - 6.0 * c) * a3 +
                        (-18.0 + 12.0 * b + 6.0 * c) * a2 + (6.0 - 2.0 * b)) / 6.0
            if a <= 2.0:
                return ((-b - 6.0 * c) * a3 +
                        (6.0 * b + 30.0 * c) * a2 +
                        (-12.0 * b - 48.0 * c) * a + (8.0 * b + 24.0 * c)) / 6.0
            return 0.0
        if method == METHOD_SINC:
            return _sinc((x - xl) * fx)
        # lanczos
        env_v = _envelope((x - xl) * ex)
        return (_sinc((x - xl) * fx) - sharpen) * env_v

    offset = np.zeros(out_size, np.int64)
    taps = np.zeros((out_size, max_taps), np.float64)

    for j in range(out_size):
        ox = (0.5 + j - shift) / out_size
        x = ox * in_size - corr
        x = min(max(x, 0.0), in_size - 1)
        xi = math.floor(x - tap_offs)

        offset[j] = xi
        t = np.array([get_tap(l, xi, x) for l in range(max_taps)])
        t /= t.sum()

        # fold out-of-range taps into the edges (resampler_calculate_taps)
        if xi < 0:
            sh = -xi
            t[sh] += t[:sh].sum()
            t[: max_taps - sh] = t[sh:].copy()
            t[max_taps - sh:] = 0
            offset[j] += sh
        if xi > in_size - max_taps:
            sh = xi - (in_size - max_taps)
            # fold the sh out-of-range tail taps into the last valid tap,
            # then shift the whole filter right by sh and zero the head
            t[max_taps - sh - 1] += t[max_taps - sh:].sum()
            shifted = np.zeros_like(t)
            shifted[sh:] = t[: max_taps - sh]
            t = shifted
            offset[j] -= sh

        taps[j] = t

    return Resampler(in_size, out_size, max_taps,
                     offset.astype(np.int64), taps)


def make_resampler_interlaced(method: str, in_size: int, out_size: int,
                              n_taps: int = 0, **kw) -> Resampler:
    """GST_VIDEO_SCALER_FLAG_INTERLACED (video-scaler.c:229): build two
    half-size field resamplers — top shifted +0.5*out/in with HALF_TAPS,
    bottom shifted -0.5*out/in with the top's tap count — and zip them
    (resampler_zip: output row i uses field resampler i&1 at row i/2,
    source offset doubled onto the field's lines)."""
    shift = (0.5 * out_size) / in_size
    t_in = (in_size + 1) // 2
    t_out = (out_size + 1) // 2
    tr = make_resampler(method, t_in, t_out, n_taps, shift=shift,
                        half_taps=True, **kw)
    br = make_resampler(method, in_size - t_in, out_size - t_out,
                        tr.max_taps, shift=-shift, **kw)
    assert br.max_taps == tr.max_taps
    max_taps = tr.max_taps
    offset = np.zeros(out_size, np.int64)
    taps = np.zeros((out_size, max_taps), np.float64)
    for i in range(out_size):
        r = br if (i & 1) else tr
        offset[i] = r.offset[i // 2] * 2 + (i & 1)
        taps[i] = r.taps[i // 2]
    return Resampler(in_size, out_size, max_taps, offset, taps)


def convert_coeff(src: np.ndarray, precision: int) -> np.ndarray:
    """resampler_convert_coeff (video-scaler.c:339): round float taps to
    int with a bisected bias so they sum exactly to 2^precision."""
    multiplier = float(1 << precision)
    l_offset, h_offset, offset = 0.0, 1.0, 0.5
    dest = np.zeros(len(src), np.int64)
    for _ in range(64):
        dest = np.floor(offset + src * multiplier).astype(np.int64)
        s = int(dest.sum())
        if s == (1 << precision):
            break
        if l_offset == h_offset:
            break
        if s < (1 << precision):
            if offset > l_offset:
                l_offset = offset
            offset += (h_offset - l_offset) / 2
        else:
            if offset < h_offset:
                h_offset = offset
            offset -= (h_offset - l_offset) / 2
    return dest.astype(np.int16)


# ---------------------------------------------------------------------------
# Application.
# ---------------------------------------------------------------------------

def tap_matrix(res: Resampler, precision: int = SCALE_U8) -> np.ndarray:
    """Dense (out_size, in_size) int tap matrix (zeros elsewhere).

    Offsets after edge fold-in are guaranteed within [0, in_size-max_taps],
    so scatter never clips."""
    m = np.zeros((res.out_size, res.in_size), np.int32)
    ts16 = res.taps_s16(precision)
    for j in range(res.out_size):
        o = int(res.offset[j])
        m[j, o:o + res.max_taps] = ts16[j]
    return m



def _mm_limbs(xp, x_b, m: np.ndarray):
    """Exact tap-matrix product for bf16 pixel operands: taps split into
    hi/lo limbs (<=8 significant bits each, exact in bf16) CONCATENATED
    along the output axis so the big pixel operand streams from HBM once;
    the two halves add in f32 (exact: both partial sums are integers well
    below 2^24)."""
    m_hi = (m >> 5) << 5
    m_lo = m - m_hi
    cat = np.concatenate([m_hi.T, m_lo.T], axis=1)
    r = xp.matmul(x_b, xp.asarray(cat, dtype=xp.bfloat16),
                  preferred_element_type=xp.float32)
    n = m.shape[0]
    return r[..., :n] + r[..., n:]


def _block_pattern(res: Resampler, precision: int):
    """Polyphase block decomposition of the tap table.

    For a rational ratio in/out = L/D (reduced), the reference's tap
    generation repeats with period D outputs every L inputs: the
    quantized taps depend only on the output pixel's fractional phase
    (resampler_calculate_taps, video-resampler.c:204).  Boundary
    outputs differ only by the edge-clamp fold-in, which is EXACTLY
    equivalent to edge-replicating the input and applying the interior
    (ideal) taps — verified here tap-by-tap; None when the table
    doesn't decompose.

    Returns dict with D, L, blocks nb, pads (P1, P2), window start S,
    window width W and the (W, D) block tap matrix."""
    import math
    g = math.gcd(res.in_size, res.out_size)
    if g < 2:
        return None
    D = res.out_size // g
    L = res.in_size // g
    nb = g
    T = res.max_taps
    ts = res.taps_s16(precision).astype(np.int64)
    off = res.offset.astype(np.int64)
    j0 = (nb // 2) * D
    base = off[j0:j0 + D] - (nb // 2) * L
    pat = ts[j0:j0 + D]
    jj = np.arange(res.out_size)
    ideal_off = base[jj % D] + (jj // D) * L
    interior = (ideal_off >= 0) & (ideal_off + T <= res.in_size)
    if not np.array_equal(off[interior], ideal_off[interior]):
        return None
    if not np.array_equal(ts[interior], pat[jj[interior] % D]):
        return None
    # boundary outputs quantize their taps AFTER the float edge fold-in
    # (convert_coeff runs on the folded float taps), so they are NOT
    # reproducible from the quantized pattern — they are computed
    # exactly with their stored taps and patched over the block result.
    # They form a leading + trailing run (ideal_off is monotone).
    bad = np.nonzero(~interior)[0]
    n_front = 0
    while n_front < bad.size and bad[n_front] == n_front:
        n_front += 1
    n_tail = bad.size - n_front
    if n_tail and not np.array_equal(
            bad[n_front:], np.arange(res.out_size - n_tail, res.out_size)):
        return None                    # non-contiguous boundary set
    front = tail = None
    if n_front:
        w_f = int(off[:n_front].max()) + T
        mf = np.zeros((n_front, w_f), np.int32)
        for j in range(n_front):
            mf[j, int(off[j]):int(off[j]) + T] = ts[j]
        front = mf
    if n_tail:
        j0t = res.out_size - n_tail
        s_t = int(off[j0t:].min())
        mt = np.zeros((n_tail, res.in_size - s_t), np.int32)
        for k, j in enumerate(range(j0t, res.out_size)):
            mt[k, int(off[j]) - s_t:int(off[j]) - s_t + T] = ts[j]
        tail = (s_t, mt)
    P1 = max(0, -int(ideal_off.min()))
    P2 = max(0, int(ideal_off.max()) + T - res.in_size)
    base_p = base + P1
    S = int(base_p.min())
    W = int(base_p.max()) + T - S
    Mb = np.zeros((D, W), np.int32)
    for p in range(D):
        s = int(base_p[p]) - S
        Mb[p, s:s + T] = pat[p]
    return {"D": D, "L": L, "nb": nb, "P1": P1, "P2": P2, "S": S,
            "W": W, "Mb": Mb, "front": front, "tail": tail,
            "n_front": n_front, "n_tail": n_tail}


def scale_axis_block_exact(xp, src, res: Resampler, blk,
                           precision: int = SCALE_U8,
                           value_bits: int = 8):
    """Block-polyphase scaling of the LAST axis: instead of the dense
    (in x out) tap matmul (a band matrix that is almost all zeros for
    large ratios), the input is cut into nb strided windows of width W
    and contracted against the (W, D) per-block taps — FLOPs drop by
    ~in/W while staying bit-identical (same S16 taps, same bf16 limb
    arithmetic, same rounding).  src: (..., in), already on device.

    OPT-IN, not routed by default: measured on TPU v5e (2025-08) the
    dense limb matmul is HBM-bound, not FLOP-bound — it holds ~7.5 ms
    per 256x1080 batch from K=1920 all the way to K=7680 — while this
    path's unaligned (L-wide) lane reshapes cost 1.5-3x more (13.7 ms
    at 1920->224/2-tap, 25 ms at cubic).  Kept verified-exact for
    toolchains where relayout is cheaper or K grows past HBM parity."""
    D, L, nb = blk["D"], blk["L"], blk["nb"]
    P1, P2, S, W = blk["P1"], blk["P2"], blk["S"], blk["W"]
    Mb = blk["Mb"]
    maxv = (1 << value_bits) - 1
    rnd = (1 << precision) - 1

    reps = -(-W // L)                  # L-wide strips covering the window

    def widen_pad(x):
        parts = []
        if P1:
            parts.append(xp.broadcast_to(x[..., :1], x.shape[:-1] + (P1,)))
        parts.append(x)
        # right pad: edge replicate for the real P2 reads, plus slack so
        # the shifted-strip reshapes below stay in bounds
        slack = max(0, (reps * L + nb * L)
                    - (x.shape[-1] + P1 + P2 - S)) + P2
        if slack:
            parts.append(xp.broadcast_to(x[..., -1:],
                                         x.shape[:-1] + (slack,)))
        return xp.concatenate(parts, axis=-1) if len(parts) > 1 else x

    def blocks_of(x):
        y = widen_pad(x)[..., S:]
        strips = [y[..., r * L:(r + nb) * L].reshape(
            y.shape[:-1] + (nb, L)) for r in range(reps)]
        a = xp.concatenate(strips, axis=-1) if reps > 1 else strips[0]
        return a[..., :W]

    def mm(x_b):
        return _mm_limbs(xp, x_b, Mb)

    mats = [Mb] + ([blk["front"]] if blk["front"] is not None else []) \
        + ([blk["tail"][1]] if blk["tail"] is not None else [])
    if any(int(np.abs(m).max()) >= (1 << 13) for m in mats):
        return None

    def contract(make_operand):
        acc = _mm_limbs(xp, make_operand(blocks_of), Mb)
        acc = acc.reshape(acc.shape[:-2] + (nb * D,))
        parts = []
        if blk["front"] is not None:
            wf = blk["front"].shape[1]
            parts.append(_mm_limbs(
                xp, make_operand(lambda x: x[..., :wf]), blk["front"]))
        mid_lo, mid_hi = blk["n_front"], nb * D - blk["n_tail"]
        parts.append(acc[..., mid_lo:mid_hi])
        if blk["tail"] is not None:
            s_t, mt = blk["tail"]
            parts.append(_mm_limbs(
                xp, make_operand(lambda x: x[..., s_t:]), mt))
        return xp.concatenate(parts, axis=-1) if len(parts) > 1 \
            else parts[0]

    if value_bits <= 8:
        acc = contract(lambda view: view(src).astype(xp.bfloat16)
                       ).astype(xp.int32)
    else:
        s32 = src.astype(xp.int32)
        hi = contract(lambda view: view(s32 >> 8).astype(xp.bfloat16))
        lo = contract(lambda view: view(s32 & 0xFF).astype(xp.bfloat16))
        acc = hi.astype(xp.int32) * 256 + lo.astype(xp.int32)
    return xp.clip((acc + rnd) >> precision, 0, maxv)


def scale_axis_exact(xp, img, axis: int, res: Resampler,
                     precision: int = SCALE_U8, value_bits: int = 8):
    """Exact HQ scaling along `axis`:
    out = clamp((sum_j tap_s16[j]*src[offset+j] + 4095) >> 12)
    (video_orc_resample_scaletaps_u8/u16, video-orc.orc:2370,2507).

    Device path: dense MXU matmuls with an EXACT bf16 limb decomposition —
    taps (<=13 bit) split into hi/lo limbs with <=8 significant bits each;
    16-bit pixels additionally split into hi/lo bytes with int32
    recombination.  Bit-identical to the int64 reference arithmetic."""
    ax = axis if axis >= 0 else img.ndim + axis
    maxv = (1 << value_bits) - 1
    m = tap_matrix(res, precision)
    if xp is np:
        src = np.moveaxis(img, ax, -1).astype(np.float64)
        acc = (src @ m.T.astype(np.float64)).astype(np.int64)
    else:
        src = xp.moveaxis(img, ax, -1)
        limb_ok = int(np.abs(m).max()) < (1 << 13)

        def mm_exact_u8(x_b):
            # x_b: bf16 values <=255 (exact); single concatenated-limb
            # matmul with f32 accumulation
            return _mm_limbs(xp, x_b, m)

        if limb_ok and value_bits <= 8:
            acc = mm_exact_u8(src.astype(xp.bfloat16)).astype(xp.int32)
        elif limb_ok:
            hi = (src.astype(xp.int32) >> 8).astype(xp.bfloat16)
            lo = (src.astype(xp.int32) & 0xFF).astype(xp.bfloat16)
            acc = (mm_exact_u8(hi).astype(xp.int32) * 256
                   + mm_exact_u8(lo).astype(xp.int32))
        else:
            import jax
            acc = xp.matmul(src.astype(xp.float32),
                            xp.asarray(m.T, dtype=xp.float32),
                            precision=jax.lax.Precision.HIGHEST
                            ).astype(xp.int32)
    rnd = (1 << precision) - 1
    out = (acc + rnd) >> precision
    out = xp.clip(out, 0, maxv)
    if xp is np:
        out = out.astype(np.int64)
    return xp.moveaxis(out, -1, ax)


def scale_rows_split_exact(xp, even, odd, res: Resampler,
                           precision: int = SCALE_U8, value_bits: int = 8):
    """Vertical scale where the input rows arrive as separate even/odd
    planes (each (..., in/2, W)): the contraction splits by row parity
    BEFORE the fixed-point rounding, so
        acc = even @ T[:, 0::2].T + odd @ T[:, 1::2].T
    is bit-identical to scaling the interleaved plane.  Used downstream
    of the fused Pallas ingest kernel."""
    m = tap_matrix(res, precision)
    me, mo = m[:, 0::2], m[:, 1::2]
    maxv = (1 << value_bits) - 1
    even = even[..., :me.shape[1], :]
    odd = odd[..., :mo.shape[1], :]

    def mm(x, mm_):
        if xp is np:
            return (np.moveaxis(x, -2, -1).astype(np.float64)
                    @ mm_.T.astype(np.float64))
        xb = xp.moveaxis(x, -2, -1).astype(xp.bfloat16)
        return _mm_limbs(xp, xb, mm_)

    acc = mm(even, me) + mm(odd, mo)
    acc = acc.astype(xp.int32) if xp is not np else acc.astype(np.int64)
    out = (acc + ((1 << precision) - 1)) >> precision
    out = xp.clip(out, 0, maxv)
    return xp.moveaxis(out, -1, -2)


def scale_cols_split_exact(xp, even, odd, res: Resampler,
                           precision: int = SCALE_U8, value_bits: int = 8):
    """Horizontal scale where the input columns arrive as separate
    even/odd phase planes (each (..., H, ceil(in/2) / floor(in/2))):
        acc = even @ T[:, 0::2].T + odd @ T[:, 1::2].T
    — bit-identical to scaling the interleaved plane (the parity split
    happens before the (acc+4095)>>12 rounding)."""
    m = tap_matrix(res, precision)
    me, mo = m[:, 0::2], m[:, 1::2]
    maxv = (1 << value_bits) - 1
    ne, no = me.shape[1], mo.shape[1]
    even = even[..., :ne]
    odd = odd[..., :no]

    def mm(x, mm_):
        if xp is np:
            return x.astype(np.float64) @ mm_.T.astype(np.float64)
        return _mm_limbs(xp, x.astype(xp.bfloat16), mm_)

    acc = mm(even, me) + mm(odd, mo)
    acc = acc.astype(xp.int32) if xp is not np else acc.astype(np.int64)
    out = (acc + ((1 << precision) - 1)) >> precision
    return xp.clip(out, 0, maxv)


def scale_axis_ref(img: np.ndarray, axis: int, res: Resampler,
                   precision: int = SCALE_U8,
                   value_bits: int = 8) -> np.ndarray:
    """Numpy gold using explicit gather (mirrors video_scale_h_ntap_u8)."""
    ax = axis if axis >= 0 else img.ndim + axis
    src = np.moveaxis(img, ax, -1).astype(np.int64)
    ts16 = res.taps_s16(precision).astype(np.int64)
    out = np.zeros(src.shape[:-1] + (res.out_size,), np.int64)
    for j in range(res.max_taps):
        idx = res.offset + j
        out += src[..., idx] * ts16[:, j]
    out = (out + ((1 << precision) - 1)) >> precision
    out = np.clip(out, 0, (1 << value_bits) - 1)
    return np.moveaxis(out, -1, ax)


def scale_hv_exact(xp, img, h_res: Resampler, v_res: Resampler,
                   precision: int = SCALE_U8, value_bits: int = 8):
    """Fused h-then-v scale with a TRANSPOSED intermediate: both
    contractions ride the lane (minor) axis, avoiding the sublane-dim
    dot of the plain vertical pass.

        T1[b, n, h] = round(sum_k Th[n, k] * img[b, h, k])   (h pass)
        out[b, m, n] = round(sum_h Tv[m, h] * T1[b, n, h])   (v pass)

    Bit-identical to scale_axis_exact(-1) then (-2): the fixed-point
    rounding happens after each pass exactly as in the sequential
    chain; only the memory layout of the intermediate differs."""
    mh = tap_matrix(h_res, precision)
    mv = tap_matrix(v_res, precision)
    maxv = (1 << value_bits) - 1
    rnd = (1 << precision) - 1
    if xp is np:
        t1 = (img.astype(np.float64) @ mh.T.astype(np.float64)).astype(np.int64)
        t1 = np.clip((t1 + rnd) >> precision, 0, maxv)       # (..., H, OW)
        t1 = np.moveaxis(t1, -1, -2)                          # (..., OW, H)
        out = (t1.astype(np.float64) @ mv.T.astype(np.float64)).astype(np.int64)
        out = np.clip((out + rnd) >> precision, 0, maxv)      # (..., OW, OH)
        return np.moveaxis(out, -1, -2)
    # h pass, output transposed: (..., OW, H)
    acc = xp.einsum("...hk,nk->...nh", img.astype(xp.bfloat16),
                    _limb_cat(xp, mh), preferred_element_type=xp.float32)
    n = mh.shape[0]
    t1 = _limb_fold(xp, acc, n, axis=-2)
    t1 = xp.clip((t1.astype(xp.int32) + rnd) >> precision, 0, maxv)
    # v pass on the lane axis: (..., OW, OH) -> transpose small output
    acc2 = xp.einsum("...nh,mh->...nm", t1.astype(xp.bfloat16),
                     _limb_cat(xp, mv), preferred_element_type=xp.float32)
    m = mv.shape[0]
    out = _limb_fold(xp, acc2, m, axis=-1)
    out = xp.clip((out.astype(xp.int32) + rnd) >> precision, 0, maxv)
    return xp.swapaxes(out, -1, -2)


def scale_hv_split_exact(xp, even, odd, h_res: Resampler, v_res: Resampler,
                         row_even=None, row_odd=None,
                         precision: int = SCALE_U8, value_bits: int = 8):
    """Fused phase-split h+v scale for 4:2:0 chroma: column-parity
    phases contract against split h-taps (transposed output), then
    row-parity phases contract against split v-taps on the lane axis.

    (even, odd): column phases of the row-EVEN field; (row_even=None)
    means 4:2:2 (single row field).  For 4:2:0 pass the four phases
    as (even=ce_re, odd=co_re, row_even=ce_ro, row_odd=co_ro)."""
    mh = tap_matrix(h_res, precision)
    me, mo = mh[:, 0::2], mh[:, 1::2]
    mv = tap_matrix(v_res, precision)
    mve, mvo = mv[:, 0::2], mv[:, 1::2]
    maxv = (1 << value_bits) - 1
    rnd = (1 << precision) - 1

    def hpass_T(ce, co):
        """column-split h pass, transposed output (..., OW, Hc)."""
        ce = ce[..., :me.shape[1]]
        co = co[..., :mo.shape[1]]
        if xp is np:
            acc = (ce.astype(np.float64) @ me.T.astype(np.float64)
                   + co.astype(np.float64) @ mo.T.astype(np.float64)
                   ).astype(np.int64)
            t = np.clip((acc + rnd) >> precision, 0, maxv)
            return np.moveaxis(t, -1, -2)
        a = xp.einsum("...hk,nk->...nh", ce.astype(xp.bfloat16),
                      _limb_cat(xp, me), preferred_element_type=xp.float32)
        b = xp.einsum("...hk,nk->...nh", co.astype(xp.bfloat16),
                      _limb_cat(xp, mo), preferred_element_type=xp.float32)
        n = mh.shape[0]
        acc = _limb_fold(xp, a, n, axis=-2) + _limb_fold(xp, b, n, axis=-2)
        return xp.clip((acc.astype(xp.int32) + rnd) >> precision, 0, maxv)

    h_re = hpass_T(even, odd)                       # (..., OW, Hc)
    if row_even is None:
        # 4:2:2: single field, plain v pass on the lane axis
        vre = h_re[..., :mv.shape[1]]
        if xp is np:
            out = (vre.astype(np.float64) @ mv.T.astype(np.float64)
                   ).astype(np.int64)
            out = np.clip((out + rnd) >> precision, 0, maxv)
            return np.moveaxis(out, -1, -2)
        acc2 = xp.einsum("...nh,mh->...nm", vre.astype(xp.bfloat16),
                         _limb_cat(xp, mv), preferred_element_type=xp.float32)
        out = _limb_fold(xp, acc2, mv.shape[0], axis=-1)
        out = xp.clip((out.astype(xp.int32) + rnd) >> precision, 0, maxv)
        return xp.swapaxes(out, -1, -2)
    h_ro = hpass_T(row_even, row_odd)
    h_re = h_re[..., :mve.shape[1]]
    h_ro = h_ro[..., :mvo.shape[1]]
    if xp is np:
        acc = (h_re.astype(np.float64) @ mve.T.astype(np.float64)
               + h_ro.astype(np.float64) @ mvo.T.astype(np.float64)
               ).astype(np.int64)
        out = np.clip((acc + rnd) >> precision, 0, maxv)
        return np.moveaxis(out, -1, -2)
    a = xp.einsum("...nh,mh->...nm", h_re.astype(xp.bfloat16),
                  _limb_cat(xp, mve), preferred_element_type=xp.float32)
    b = xp.einsum("...nh,mh->...nm", h_ro.astype(xp.bfloat16),
                  _limb_cat(xp, mvo), preferred_element_type=xp.float32)
    m = mv.shape[0]
    out = _limb_fold(xp, a, m, axis=-1) + _limb_fold(xp, b, m, axis=-1)
    out = xp.clip((out.astype(xp.int32) + rnd) >> precision, 0, maxv)
    return xp.swapaxes(out, -1, -2)


def _limb_cat(xp, m: np.ndarray):
    """Concatenated hi/lo limb matrix (2n, k) as bf16."""
    m_hi = (m >> 5) << 5
    m_lo = m - m_hi
    return xp.asarray(np.concatenate([m_hi, m_lo], axis=0),
                      dtype=xp.bfloat16)


def _limb_fold(xp, r, n: int, axis: int):
    """Fold the concatenated-limb halves back together along `axis`."""
    if axis == -2:
        return r[..., :n, :] + r[..., n:, :]
    return r[..., :n] + r[..., n:]
