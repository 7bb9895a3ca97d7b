"""deinterlace — interlaced to progressive video.

TPU-native re-design of the reference element
(subprojects/gst-plugins-good/gst/deinterlace/ — method enum
gstdeinterlace.h:50-60, per-method vtables gstdeinterlacemethod.h:74-101,
field history engine gstdeinterlace.c:1155-1270 [field_history[0] is the
NEWEST field; new fields shift older ones to higher indices]).

Field-history model: the input batch is split into a time-ordered FIELD
sequence (TFF: top then bottom per frame); the last two input frames are
carried across ticks so every output uses its true neighbors — for
output field S[j]: the one-field-OLDER field S[j-1] is the reference's
history[cur+1], the one-field-NEWER S[j+1] is history[cur-1]
(gstdeinterlacemethod.c get_line :382 field_offset sign convention).
Methods with latency 1 (greedyl/greedyh — gstdeinterlacemethod.h
latency) defer the final field of each tick to the next one; the very
first field of a stream falls back to linear, exactly like the
reference's backup-method path (greedyh.c:805 cur_field_idx < 1).

Method kernels (all integer-exact ports of the scanline functions):

* linear / linearblend / vfir / greedyl: tvtime.orc kernels
  (deinterlace_line_vfir :2, _linear_blend :72, _greedy :92) with the
  correct field sources: t0/b0 from the kept field's source frame
  (including the reference's edge clamping into the stale opposite
  field, gstdeinterlacemethod.c get_line CLAMP), m1/tt1/bb1 from the
  one-OLDER field, mp from the one-NEWER field.
* greedyh: greedyh.c greedyh_scanline_C_planar_y/_uv :470/:576 —
  surround-averaged bob (avg_sc), best-of L2/L2P by distance to it,
  max-comb clamp, and the luma-only motion blend
  (out*(256-mov)+avg_sc*mov)/256; frame assembly per
  deinterlace_frame_di_greedyh_plane :718 (first/last line copies
  differ by field parity).
* tomsmocomp: the reference's PORTABLE C build compiles every
  search-effort level with SKIP_SEARCH (TomsMoCompAll2.inc — the
  motion-compensated search exists only in the x86 asm); the faithful
  portable semantics are the WierdBob.inc / StrangeBob.inc diagonal
  candidate selection clamped to the vertical neighbors, which is what
  this port implements (search-effort is accepted and ignored, like the
  C build).  The C include's per-line pointer stepping is internally
  inconsistent (SearchLoopBottom.inc C tail advances two lines per
  iteration); this port uses the coherent line mapping of the asm path.
* yadif: yadif.c:251 FILTER with true prev/next FRAME neighbors
  (fields +-2) carried across ticks.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)
from ..core.value import Fraction
from ..video.info import VideoInfo

DEINT_CAPS = ("video/x-raw, format={ I420, YV12, Y444, Y42B, NV12, AYUV }, "
              "width=[1,32767], height=[1,32767], "
              "framerate=[0/1,2147483647/1]")

METHODS = ["tomsmocomp", "greedyh", "greedyl", "vfir", "linear",
           "linearblend", "scalerbob", "weave", "weave-tff", "weave-bff",
           "yadif"]

# fields of temporal context each method needs, as (older, newer) counts
# in FIELD units (latency == newer; gstdeinterlacemethod.h latency)
_NEED = {
    "linear": (0, 0), "scalerbob": (0, 0), "weave": (1, 0),
    "weave-tff": (1, 0), "weave-bff": (1, 0), "linearblend": (1, 0),
    "vfir": (1, 0), "greedyl": (1, 1), "greedyh": (1, 1),
    "tomsmocomp": (0, 0),      # portable C build: spatial only
    "yadif": (2, 2),           # prev/next frame
}


def _pallas_backend() -> bool:
    """Pallas kernels only lower on TPU (the CPU backend supports
    interpret mode only — not worth it for a memcpy-bound op)."""
    import jax
    return jax.default_backend() == "tpu"


def _shift_rows(xp, p, n):
    """Row p[y+n] with edge clamping (get_line CLAMP semantics)."""
    if n == 0:
        return p
    h = p.shape[-2]
    idx = np.clip(np.arange(h) + n, 0, h - 1)
    return p[..., idx, :]


def _shift_cols(xp, p, n):
    if n == 0:
        return p
    w = p.shape[-1]
    idx = np.clip(np.arange(w) + n, 0, w - 1)
    return p[..., :, idx]


def _interleave_rows(xp, a, b):
    """rows a0 b0 a1 b1 ... (a, b same shape (..., F, W)) -> (..., 2F, W)"""
    st = xp.stack([a, b], axis=-2)
    return st.reshape(a.shape[:-2] + (a.shape[-2] * 2, a.shape[-1]))


# ---------------------------------------------------------------------------
# scanline kernels (int32 in/out)
# ---------------------------------------------------------------------------

def _greedyh_synth(xp, l1, l3, l2, lp2, luma: bool, max_comb: int,
                   motion_threshold: int, motion_sense: int):
    """greedyh_scanline_C_planar_y / _uv (greedyh.c:470,:576).

    l1/l3: kept-field lines above/below the synthesized line;
    l2: one-OLDER opposite-parity field line (the reference's L2 =
    history[cur_field_idx + 1]); lp2: one-NEWER (L2P = history[cur-1])."""
    avg = (l1 + l3) >> 1
    # avg_1 = avg of NEXT pixel (edge: repeat), avg__1 = previous pixel's
    # avg (Pos==0: avg itself)
    avg_1 = _shift_cols(xp, avg, 1)
    avg_m1 = _shift_cols(xp, avg, -1)
    avg_s = (avg_m1 + avg_1) >> 1
    avg_sc = (avg + avg_s) >> 1
    best = xp.where(xp.abs(l2 - avg_sc) > xp.abs(lp2 - avg_sc), lp2, l2)
    mx = xp.minimum(xp.maximum(l1, l3) + max_comb, 255)
    mn = xp.maximum(xp.minimum(l1, l3) - max_comb, 0)
    out = xp.clip(best, mn, mx)
    if luma:
        mov = xp.maximum(xp.abs(l2 - lp2) - motion_threshold, 0)
        mov = xp.minimum(mov * motion_sense, 256)
        out = (out * (256 - mov) + avg_sc * mov) >> 8
    return out


def _tomsmocomp_synth(xp, above, below, strange: bool, diff_thres: int = 15):
    """WierdBob.inc / StrangeBob.inc C paths under SKIP_SEARCH.

    above/below: kept-field lines bracketing the synthesized line.
    Diagonal candidates (pixel offsets; WierdBob comment diagram):
        a=above[x-1] f=below[x+1]; c=above[x+1] d=below[x-1];
        j=above[x-2] n=below[x+2]; k=above[x+2] m=below[x-2]
    selected by smallest |pair diff| (strict <, fixed order), then
    clamped to [min(b,e), max(b,e)] with b=above[x], e=below[x].
    The reference's k,m diff bookkeeping quirk (uses pBob[-4]/-3, i.e.
    the j-side pixel) is reproduced.  Column edges (first/last 2 pixels)
    use simple bob, including the pDest[0] quirk (pairs with below[x+1])."""
    b = above
    e = below

    def pair(o):
        return _shift_cols(xp, above, o), _shift_cols(xp, below, -o)

    if not strange:
        a_, f_ = _shift_cols(xp, above, -1), _shift_cols(xp, below, 1)
        best = (a_ + f_) >> 1
        diff = xp.abs(a_ - f_)
        for off in (1, -2, 2):
            ca, cb = pair(off)
            d = xp.abs(ca - cb)
            if off == 2:
                # reference quirk: diff recorded from the j-side pixels
                ja = _shift_cols(xp, above, -2)
                d_rec = xp.abs(ja - cb)
            else:
                d_rec = d
            upd = d < diff
            best = xp.where(upd, (ca + cb) >> 1, best)
            diff = xp.where(upd, d_rec, diff)
    else:
        # StrangeBob: candidate accepted only when the OPPOSITE diagonal
        # is still (< thres) while this one moves (> thres); (b,e) last
        best = xp.zeros_like(above)
        diff = xp.full_like(above, -1)

        def try_cand(cond, ca, cb):
            nonlocal best, diff
            d = xp.abs(ca - cb)
            best = xp.where(cond, (ca + cb) >> 1, best)
            diff = xp.where(cond, d, diff)

        # j,n gate: |above[x-1] - below[x-2]| < T and |j - n| > T
        ja, nb = pair(-2)
        g = ((xp.abs(_shift_cols(xp, above, -1)
                     - _shift_cols(xp, below, -2)) < diff_thres)
             & (xp.abs(ja - nb) > diff_thres))
        try_cand(g, _shift_cols(xp, above, -1), _shift_cols(xp, below, -2))
        # k,m gate: |above[x+1] - below[x+2]| < T and |k - m| > T
        ka, mb = _shift_cols(xp, above, 2), _shift_cols(xp, below, -2)
        g = ((xp.abs(_shift_cols(xp, above, 1)
                     - _shift_cols(xp, below, 2)) < diff_thres)
             & (xp.abs(ka - mb) > diff_thres))
        try_cand(g, ka, mb)
        # c,d gate: |b - below[x+1]| < T and |c - d| > T
        ca, db = _shift_cols(xp, above, 1), _shift_cols(xp, below, -1)
        g = ((xp.abs(b - _shift_cols(xp, below, 1)) < diff_thres)
             & (xp.abs(ca - db) > diff_thres))
        try_cand(g, ca, db)
        # a,f gate: |b - below[x-1]| < T and |a - f| > T
        aa, fb = _shift_cols(xp, above, -1), _shift_cols(xp, below, 1)
        g = ((xp.abs(b - _shift_cols(xp, below, -1)) < diff_thres)
             & (xp.abs(aa - fb) > diff_thres))
        try_cand(g, aa, fb)
        # b,e: unconditional when close
        g = xp.abs(b - e) < diff_thres
        best = xp.where(g, (b + e) >> 1, best)

    out = xp.clip(best, xp.minimum(b, e), xp.maximum(b, e))
    # column boundaries: simple bob on first/last two pixels
    simple = (b + e) >> 1
    w = above.shape[-1]
    col = np.arange(w)
    edge = xp.asarray((col < 2) | (col >= w - 2))
    out = xp.where(edge, simple, out)
    # pDest[0] quirk: pairs above[0] with below[1]
    quirk0 = (b[..., 0:1] + _shift_cols(xp, below, 1)[..., 0:1]) >> 1
    return xp.concatenate([quirk0, out[..., 1:]], axis=-1)


def _greedyl_synth(xp, t, bt, m1, mp, max_comb: int):
    """tvtime.orc deinterlace_line_greedy :92 — best of m1 (older) / mp
    (newer) by distance to avg(t,b), clamped to [min-mc, max+mc]."""
    avg = (t + bt + 1) >> 1
    best = xp.where(xp.abs(m1 - avg) > xp.abs(mp - avg), mp, m1)
    mx = xp.minimum(xp.maximum(t, bt) + max_comb, 255)
    mn = xp.maximum(xp.minimum(t, bt) - max_comb, 0)
    return xp.clip(best, mn, mx)


def _yadif_synth(xp, c, e, m_prev, m_next, tp_t, tp_b, tn_t, tn_b,
                 b2, f2):
    """yadif.c:251 FILTER (vectorized; round-1 kernel, field sources now
    supplied by the caller from true history)."""
    d = (m_prev + m_next) >> 1
    temporal_diff0 = xp.abs(m_prev - m_next)
    temporal_diff1 = (xp.abs(tp_t - c) + xp.abs(tp_b - e)) >> 1
    temporal_diff2 = (xp.abs(tn_t - c) + xp.abs(tn_b - e)) >> 1
    diff = xp.maximum(temporal_diff0 >> 1,
                      xp.maximum(temporal_diff1, temporal_diff2))

    def sx(a, n):
        return _shift_cols(xp, a, n)

    spatial_pred = (c + e) >> 1
    spatial_score = (xp.abs(sx(c, -1) - sx(e, -1)) + xp.abs(c - e)
                     + xp.abs(sx(c, 1) - sx(e, 1)))

    def check(j, score, pred, gate):
        s = (xp.abs(sx(c, -1 + j) - sx(e, -1 - j))
             + xp.abs(sx(c, j) - sx(e, -j))
             + xp.abs(sx(c, 1 + j) - sx(e, 1 - j)))
        better = gate & (s < score)
        p2 = (sx(c, j) + sx(e, -j)) >> 1
        return (xp.where(better, s, score), xp.where(better, p2, pred),
                better)

    allg = spatial_score == spatial_score
    score, pred, g1 = check(-1, spatial_score, spatial_pred, allg)
    score, pred, _ = check(-2, score, pred, g1)
    score, pred, g3 = check(1, score, pred, allg)
    score, pred, _ = check(2, score, pred, g3)

    mx = xp.maximum(xp.maximum(d - e, d - c), xp.minimum(b2 - c, f2 - e))
    mn = xp.minimum(xp.minimum(d - e, d - c), xp.maximum(b2 - c, f2 - e))
    diff = xp.maximum(diff, xp.maximum(mn, -mx))
    return xp.clip(pred, d - diff, d + diff)


# ---------------------------------------------------------------------------
# element
# ---------------------------------------------------------------------------

@register_element
class Deinterlace(TransformElement):
    FACTORY = "deinterlace"
    DESCRIPTION = "Deinterlace video"
    HOST_ELEMENT = True     # carries true field history across ticks
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, DEINT_CAPS),
        PadTemplate("src", PadDirection.SRC, DEINT_CAPS),
    ]
    PROPERTIES = {
        "method": (str, "linear", "|".join(METHODS)),
        "mode": (str, "auto", "auto|interlaced|disabled"),
        "fields": (str, "all", "all|top|bottom"),
        "field-layout": (str, "tff", "tff|bff (auto falls back to tff "
                         "like the reference warning path)"),
        # method sub-properties (reference exposes them on the method
        # GObjects: greedyh.c:930-955, greedy.c, tomsmocomp.c)
        "max-comb": (int, -1, "-1 = method default (greedyh 5, greedyl 15)"),
        "motion-threshold": (int, 25, "greedyh"),
        "motion-sense": (int, 30, "greedyh"),
        "search-effort": (int, 5, "tomsmocomp (ignored: the reference's "
                          "portable C build skips the search)"),
        "strange-bob": (bool, False, "tomsmocomp bob variant"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._carry_planes = None       # planes of up to 2 carried frames
        self._pending = 0               # carried fields not yet output
        self._started = False
        self._jit_cache = {}

    def transform_caps(self, direction, caps, filter=None):
        out = []
        for s in caps:
            ns = s.copy()
            ns.fields.pop("interlace-mode", None)
            if self.props["fields"] == "all" and "framerate" in ns.fields:
                fr = ns["framerate"]
                if isinstance(fr, Fraction):
                    ns["framerate"] = (Fraction(fr.num * 2, fr.denom)
                                       if direction == PadDirection.SINK
                                       else Fraction(fr.num, fr.denom * 2))
            out.append(ns)
        res = Caps(out)
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        self._info = VideoInfo.from_caps_structure(incaps[0])
        self._mode = self.props["mode"]

    def start(self):
        self._carry_planes = None
        self._pending = 0
        self._started = False

    def flush(self):
        self.start()

    # -- per-field synthesis ------------------------------------------------
    def _method_params(self):
        m = self.props["method"]
        mc = self.props["max-comb"]
        if mc < 0:
            mc = 5 if m == "greedyh" else 15
        return m, mc

    def _deint_fields(self, xp, plane, J: List[int], parity0: int,
                      luma: bool):
        """Output frames for field indices J, from one plane (NF, H, W).

        field i = frame i//2, parity (parity0 + i) % 2 (0 = top rows).
        Vectorized by parity group: every field in a group is processed
        in ONE batched call; edge fields that the reference handles with
        its linear backup method form their own group.  Returns
        (len(J), H, W) in J order."""
        method, max_comb = self._method_params()
        NF = plane.shape[0]
        n_fields = 2 * NF

        top = plane[..., 0::2, :]
        bot = plane[..., 1::2, :]
        fields = (_interleave_fields(xp, top, bot) if parity0 == 0
                  else _interleave_fields(xp, bot, top))

        def cl(i):
            return min(max(i, 0), n_fields - 1)

        if method in ("linear", "scalerbob"):
            # intra-frame methods: no cross-field dependency, so skip
            # the batch-axis field gathers entirely — compute both
            # parities over ALL frames and assemble the field sequence
            # with a stack+reshape (pure layout, no data movement
            # beyond one read + one write)
            if xp is not np and _pallas_backend():
                # TPU fast path: one fused Pallas kernel, 1 read +
                # 2 writes per frame (ops/deint_kernel.py); falls
                # through to XLA on inapplicable shapes
                try:
                    from ..ops.deint_kernel import deint_both_parities
                    both = deint_both_parities(plane, method, parity0)
                    seq = both.reshape((n_fields,)
                                       + plane.shape[-2:])
                    if J == list(range(J[0], J[0] + len(J))):
                        return seq[J[0]:J[0] + len(J)]
                    return seq[np.asarray(J)]
                except Exception:
                    pass
            src16 = plane.astype(xp.int16)
            t = _shift_rows(xp, src16, -1)
            interp = (t if method == "scalerbob" else
                      ((t + _shift_rows(xp, src16, 1) + 1) >> 1)) \
                .astype(xp.uint8)
            src = plane.astype(xp.uint8)
            rows_even = np.arange(plane.shape[-2]) % 2 == 0
            m_even = xp.asarray(rows_even[:, None])
            out_p0 = xp.where(m_even, src, interp)
            out_p1 = xp.where(~m_even, src, interp)
            first, second = ((out_p0, out_p1) if parity0 == 0
                             else (out_p1, out_p0))
            seq = xp.stack([first, second], axis=1).reshape(
                (n_fields,) + plane.shape[-2:])
            if J == list(range(J[0], J[0] + len(J))):
                return seq[J[0]:J[0] + len(J)]
            return seq[np.asarray(J)]

        groups = {}          # (method, par) -> list of j
        for j in J:
            par = (parity0 + j) % 2
            use_linear = (method in ("greedyl", "greedyh") and j == 0) or (
                method == "yadif" and (j < 2 or j > n_fields - 3))
            m = "linear" if use_linear else method
            groups.setdefault((m, par), []).append(j)

        pieces = []          # (j_list, (N, H, W) array)
        for (m, par), js in groups.items():
            idx = np.array([cl(j) for j in js])
            l1f = fields[idx]
            src = plane[idx // 2]
            older = fields[np.array([cl(j - 1) for j in js])]
            newer = fields[np.array([cl(j + 1) for j in js])]
            prev_f = plane[np.array([cl(j - 2) for j in js]) // 2]
            next_f = plane[np.array([cl(j + 2) for j in js]) // 2]
            out = self._deint_one(xp, m, max_comb, l1f, src, older,
                                  newer, prev_f, next_f, par, luma)
            pieces.append((js, out))

        # reassemble in J order
        order = {j: (gi, k) for gi, (js, _) in enumerate(pieces)
                 for k, j in enumerate(js)}
        cat = xp.concatenate([o for _, o in pieces], axis=0)
        offs = np.cumsum([0] + [len(js) for js, _ in pieces[:-1]])
        perm = np.array([offs[order[j][0]] + order[j][1] for j in J])
        return cat[perm]

    def _deint_one(self, xp, method, max_comb, l1f, src, older, newer,
                   prev_frame, next_frame, par, luma=True):
        """Output frames (N, H, W) for kept fields l1f (N, F, W) of
        source frames src (N, H, W), with field neighbors older/newer
        (N, F, W) and frame neighbors prev/next (N, H, W).  par: 0 =
        kept field occupies even (top) rows."""
        i32 = xp.int32
        l1f = l1f.astype(i32)
        src = src.astype(i32)
        H = src.shape[-2]

        if method in ("weave", "weave-tff", "weave-bff"):
            # kept rows from the kept field, missing rows from the
            # one-older field (m1; deinterlace_line_weave = m1 copy)
            older32 = older.astype(i32)
            if par == 0:
                out = _interleave_rows(xp, l1f, older32)
            else:
                out = _interleave_rows(xp, older32, l1f)
            return out[..., :H, :]

        if method == "greedyh":
            mt = self.props["motion-threshold"]
            ms = self.props["motion-sense"]
            older32, newer32 = older.astype(i32), newer.astype(i32)
            l1 = l1f[..., :-1, :]
            l3 = l1f[..., 1:, :]
            if par == 0:
                l2, lp2 = older32[..., :-1, :], newer32[..., :-1, :]
            else:
                l2, lp2 = older32[..., 1:, :], newer32[..., 1:, :]
            # plane 0 uses the luma scanline (motion blend), chroma
            # planes the _uv variant without it (greedyh.c:864-869)
            synth = _greedyh_synth(xp, l1, l3, l2, lp2, luma,
                                   max_comb, mt, ms)
            F = l1f.shape[-2]
            if par == 0:
                # rows: 0=l1f[0]; 2k+1=synth[k]; 2k+2=l1f[k+1]; last=L2 tail
                body = _interleave_rows(xp, l1f[..., :-1, :], synth)
                out = xp.concatenate(
                    [body, l1f[..., -1:, :], older32[..., -1:, :]], axis=-2)
            else:
                # rows 0,1 = l1f[0]; 2k+2=synth[k]; 2k+3=l1f[k+1]
                body = _interleave_rows(xp, synth, l1f[..., 1:, :])
                out = xp.concatenate(
                    [l1f[..., :1, :], l1f[..., :1, :], body], axis=-2)
            return out[..., :H, :]

        if method == "tomsmocomp":
            strange = bool(self.props["strange-bob"])
            F = l1f.shape[-2]
            if par == 0:
                above, below = l1f[..., 1:F - 1, :], l1f[..., 2:, :]
            else:
                above, below = l1f[..., :F - 2, :], l1f[..., 1:F - 1, :]
            synth = _tomsmocomp_synth(xp, above, below, strange)
            # missing rows 0 and F-1 copy the kept field's line
            # (Fieldcopy of 1st/last weave lines, TomsMoCompAll.inc:134)
            miss = xp.concatenate(
                [l1f[..., :1, :], synth, l1f[..., -1:, :]], axis=-2)
            if par == 0:
                out = _interleave_rows(xp, l1f, miss)
            else:
                out = _interleave_rows(xp, miss, l1f)
            return out[..., :H, :]

        # frame-based simple methods: synthesize missing rows over the
        # source frame (edge clamps read the stale opposite field rows,
        # matching get_line CLAMP), then mask.  older_frame is built
        # lazily — linear/scalerbob never touch it.
        def older_frame():
            return self._field_at_missing_rows(xp, older.astype(i32),
                                               src, par)

        t = _shift_rows(xp, src, -1)
        bt = _shift_rows(xp, src, 1)
        if method == "linear":
            interp = (t + bt + 1) >> 1
        elif method == "linearblend":
            m1 = older_frame()
            interp = xp.clip((t + bt + 2 * m1 + 2) >> 2, 0, 255)
        elif method == "vfir":
            m1 = older_frame()
            tt = _shift_rows(xp, m1, -2)
            bb = _shift_rows(xp, m1, 2)
            interp = xp.clip((4 * (t + bt) + 2 * m1 - (tt + bb) + 4) >> 3,
                             0, 255)
        elif method == "scalerbob":
            interp = t
        elif method == "greedyl":
            m1 = older_frame()
            mp = self._field_at_missing_rows(xp, newer.astype(i32), src,
                                             par)
            interp = _greedyl_synth(xp, t, bt, m1, mp, max_comb)
        elif method == "yadif":
            pf = prev_frame.astype(i32)
            nf = next_frame.astype(i32)
            interp = _yadif_synth(
                xp, t, bt, pf, nf,
                _shift_rows(xp, pf, -1), _shift_rows(xp, pf, 1),
                _shift_rows(xp, nf, -1), _shift_rows(xp, nf, 1),
                (_shift_rows(xp, pf, -2) + _shift_rows(xp, nf, -2)) >> 1,
                (_shift_rows(xp, pf, 2) + _shift_rows(xp, nf, 2)) >> 1)
        else:
            interp = (t + bt + 1) >> 1
        rows = np.arange(src.shape[-2]) % 2 == par
        mask = xp.asarray(rows[:, None])
        return xp.where(mask, src, interp)

    @staticmethod
    def _field_at_missing_rows(xp, field, src, par):
        """Full-frame array whose missing-parity rows hold `field`'s
        lines (kept rows: unused, filled with src)."""
        H = src.shape[-2]
        if par == 0:
            out = _interleave_rows(xp, src[..., 0::2, :], field)
        else:
            out = _interleave_rows(xp, field, src[..., 1::2, :])
        return out[..., :H, :]

    # -- tick processing ----------------------------------------------------
    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        if self._mode == "disabled":
            return buf
        import jax.numpy as jnp

        planes = tuple(buf.data)
        B = planes[0].shape[0]
        method, _ = self._method_params()
        need_old, need_new = _NEED[method]

        # prepend carried frames (true cross-tick history).  Intra-frame
        # methods never read the carried frames (their output range
        # starts at the first new field and each field only needs its
        # own frame), so skip the concat — it is a full eager device
        # copy — and with it the output J-slice becomes full-range
        # (free).  _pending is always 0 for latency-0 methods.
        intra_fast = (method in ("linear", "scalerbob")
                      and self.props["fields"] == "all"
                      and self._pending == 0)
        carry_n = 0
        if self._carry_planes is not None and not intra_fast:
            carry_n = self._carry_planes[0].shape[0]
            planes = tuple(jnp.concatenate([c, p], axis=0)
                           for c, p in zip(self._carry_planes, planes))
        NF = carry_n + B
        n_fields = 2 * NF
        parity0 = 0 if self.props["field-layout"] != "bff" else 1

        # output field range: [first_unoutput, n_fields - 1 - latency]
        start = 2 * carry_n - self._pending
        limit = n_fields - 1 - need_new
        J = list(range(start, limit + 1))

        fields_sel = self.props["fields"]
        if fields_sel == "top":
            J = [j for j in J if (parity0 + j) % 2 == 0]
        elif fields_sel == "bottom":
            J = [j for j in J if (parity0 + j) % 2 == 1]

        key = (tuple(p.shape for p in planes),
               str(planes[0].dtype), tuple(J), parity0,
               method, self.props["strange-bob"], self.props["max-comb"],
               self.props["motion-threshold"], self.props["motion-sense"])
        fn = self._jit_cache.get(key)
        if fn is None:
            import jax

            def run(ps):
                # all methods produce u8-ranged lines (the reference's
                # per-line outputs are u8); store u8 to halve the HBM
                # write vs the int32 intermediates
                return tuple(
                    self._deint_fields(jnp, p, J, parity0,
                                       luma=(pi == 0)).astype(jnp.uint8)
                    for pi, p in enumerate(ps))

            fn = jax.jit(run)
            self._jit_cache[key] = fn
        out_planes = fn(planes)

        # carry the last 2 frames; pending = fields after `limit`
        keep = min(2, NF)
        self._carry_planes = tuple(p[-keep:] for p in planes)
        self._pending = (n_fields - 1) - limit
        self._started = True

        n_out = len(J)
        dur = buf.duration
        if fields_sel == "all" and dur:
            dur = dur // 2
        return buf.with_(data=tuple(out_planes), batch=n_out, duration=dur)


def _interleave_fields(xp, first, second):
    """(NF, F, W) x2 -> (2*NF, F, W), time-interleaved."""
    st = xp.stack([first, second], axis=1)
    return st.reshape((first.shape[0] * 2,) + first.shape[1:])


@register_element
class AutoDeinterlace(Deinterlace):
    """autodeinterlace (gst-plugins-bad autoconvert family): the
    auto-mode deinterlacer under its own factory name."""
    FACTORY = "autodeinterlace"
    DESCRIPTION = "Deinterlace video automatically"
