"""deinterlace: real method kernels + true cross-tick field history.

Golds transcribe the reference C scanlines directly with scalar loops
(greedyh.c greedyh_scanline_C_planar_y/_uv :470/:576 and frame driver
:718; tomsmocomp WierdBob.inc/StrangeBob.inc C paths under SKIP_SEARCH —
the portable build's only behavior; tvtime.orc deinterlace_line_greedy),
independent of the vectorized implementation.
"""

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.elements.deinterlace import Deinterlace


W, H = 16, 12


def make_elem(method, B=2, **props):
    d = Deinterlace(method=method, **props)
    caps = Caps.from_string(
        f"video/x-raw,format=I420,width={W},height={H},framerate=30/1")
    d.set_info(caps, caps)
    d.start()
    return d


def frames(T, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, (T, H, W), np.uint8),
            rng.integers(0, 256, (T, H // 2, W // 2), np.uint8),
            rng.integers(0, 256, (T, H // 2, W // 2), np.uint8))


def run_elem(d, planes, ticks):
    """Split T frames into `ticks` equal batches, return concatenated
    output planes."""
    T = planes[0].shape[0]
    B = T // ticks
    outs = []
    for t in range(ticks):
        sl = tuple(p[t * B:(t + 1) * B] for p in planes)
        buf = d.host_process(Buffer(data=sl, pts=0, duration=33, batch=B))
        outs.append(tuple(np.asarray(p) for p in buf.data))
    return tuple(np.concatenate([o[i] for o in outs], axis=0)
                 for i in range(3))


# -- scalar golds ------------------------------------------------------------

def greedyh_line(L1, L3, L2, L2P, luma, mc=5, mt=25, ms=30):
    w = len(L1)
    out = np.zeros(w, np.int64)
    avg_prev = 0
    for x in range(w):
        l1, l3 = int(L1[x]), int(L3[x])
        l1_1 = int(L1[x + 1]) if x < w - 1 else l1
        l3_1 = int(L3[x + 1]) if x < w - 1 else l3
        avg = (l1 + l3) // 2
        if x == 0:
            avg_prev = avg
        avg_1 = (l1_1 + l3_1) // 2
        avg_s = (avg_prev + avg_1) // 2
        avg_sc = (avg + avg_s) // 2
        avg_prev = avg
        l2, lp2 = int(L2[x]), int(L2P[x])
        best = lp2 if abs(l2 - avg_sc) > abs(lp2 - avg_sc) else l2
        mx = min(max(l1, l3) + mc, 255)
        mn = max(min(l1, l3) - mc, 0)
        o = min(max(best, mn), mx)
        if luma:
            mov = min(max(abs(l2 - lp2) - mt, 0) * ms, 256)
            o = (o * (256 - mov) + avg_sc * mov) // 256
        out[x] = o
    return out


def gold_greedyh_frame(l1f, older, newer, par, luma):
    """deinterlace_frame_di_greedyh_plane (greedyh.c:718)."""
    F, w = l1f.shape
    out = np.zeros((2 * F, w), np.int64)
    if par == 0:                      # InfoIsOdd: L1 = top field
        out[0] = l1f[0]
        for k in range(F - 1):
            out[2 * k + 1] = greedyh_line(l1f[k], l1f[k + 1], older[k],
                                          newer[k], luma)
            out[2 * k + 2] = l1f[k + 1]
        out[2 * F - 1] = older[F - 1]
    else:                             # L1 = bottom field
        out[0] = l1f[0]
        out[1] = l1f[0]
        for k in range(F - 1):
            out[2 * k + 2] = greedyh_line(l1f[k], l1f[k + 1], older[k + 1],
                                          newer[k + 1], luma)
            out[2 * k + 3] = l1f[k + 1]
    return out


def wierdbob_line(above, below, strange=False, T=15):
    w = len(above)
    out = np.zeros(w, np.int64)
    a = above.astype(np.int64)
    b = below.astype(np.int64)

    def at(arr, x):
        return int(arr[min(max(x, 0), w - 1)])

    for x in range(w):
        if x < 2 or x >= w - 2:
            if x == 0:
                out[x] = (at(a, 0) + at(b, 1)) // 2
            else:
                out[x] = (at(a, x) + at(b, x)) // 2
            continue
        if not strange:
            best = (at(a, x - 1) + at(b, x + 1)) // 2
            diff = abs(at(a, x - 1) - at(b, x + 1))
            if abs(at(a, x + 1) - at(b, x - 1)) < diff:
                best = (at(a, x + 1) + at(b, x - 1)) // 2
                diff = abs(at(a, x + 1) - at(b, x - 1))
            if abs(at(a, x - 2) - at(b, x + 2)) < diff:
                best = (at(a, x - 2) + at(b, x + 2)) // 2
                diff = abs(at(a, x - 2) - at(b, x + 2))
            if abs(at(a, x + 2) - at(b, x - 2)) < diff:
                best = (at(a, x + 2) + at(b, x - 2)) // 2
                # reference quirk: records the j-side pixel's diff
                diff = abs(at(a, x - 2) - at(b, x - 2))
        else:
            best = 0
            if (abs(at(a, x - 1) - at(b, x - 2)) < T
                    and abs(at(a, x - 2) - at(b, x + 2)) > T):
                best = (at(a, x - 1) + at(b, x - 2)) // 2
            if (abs(at(a, x + 1) - at(b, x + 2)) < T
                    and abs(at(a, x + 2) - at(b, x - 2)) > T):
                best = (at(a, x + 2) + at(b, x - 2)) // 2
            if (abs(at(a, x) - at(b, x + 1)) < T
                    and abs(at(a, x + 1) - at(b, x - 1)) > T):
                best = (at(a, x + 1) + at(b, x - 1)) // 2
            if (abs(at(a, x) - at(b, x - 1)) < T
                    and abs(at(a, x - 1) - at(b, x + 1)) > T):
                best = (at(a, x - 1) + at(b, x + 1)) // 2
            if abs(at(a, x) - at(b, x)) < T:
                best = (at(a, x) + at(b, x)) // 2
        out[x] = min(max(best, min(at(a, x), at(b, x))),
                     max(at(a, x), at(b, x)))
    return out


def gold_tomsmocomp_frame(l1f, par, strange=False):
    F, w = l1f.shape
    miss = np.zeros((F, w), np.int64)
    miss[0] = l1f[0]
    miss[F - 1] = l1f[F - 1]
    for y in range(1, F - 1):
        if par == 0:
            miss[y] = wierdbob_line(l1f[y], l1f[y + 1], strange)
        else:
            miss[y] = wierdbob_line(l1f[y - 1], l1f[y], strange)
    out = np.zeros((2 * F, w), np.int64)
    if par == 0:
        out[0::2] = l1f
        out[1::2] = miss
    else:
        out[1::2] = l1f
        out[0::2] = miss
    return out


def split_fields(p):
    return p[:, 0::2], p[:, 1::2]


def field_seq(p):
    top, bot = split_fields(p)
    seq = []
    for i in range(p.shape[0]):
        seq.append((top[i], 0, i))
        seq.append((bot[i], 1, i))
    return seq


# -- tests -------------------------------------------------------------------

def test_greedyh_gold_and_history():
    planes = frames(4)
    d = make_elem("greedyh")
    out = run_elem(d, planes, ticks=2)
    for pi, p in enumerate(planes):
        S = field_seq(p.astype(np.int64))
        luma = pi == 0
        n = len(S)
        # outputs: field 0 (linear fallback) then fields 1..n-2 greedyh
        assert out[pi].shape[0] == n - 1
        for j in range(1, n - 1):
            l1f, par, _ = S[j]
            older = S[j - 1][0]
            newer = S[j + 1][0]
            exp = gold_greedyh_frame(l1f, older, newer, par, luma)
            got = out[pi][j].astype(np.int64)
            assert np.array_equal(got, exp), f"plane {pi} field {j}"


def test_greedyh_split_invariance():
    # 1 tick of 4 frames == 2 ticks of 2: true history, not batch clamps
    planes = frames(4, seed=3)
    a = run_elem(make_elem("greedyh"), planes, ticks=1)
    b = run_elem(make_elem("greedyh"), planes, ticks=2)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


@pytest.mark.parametrize("method", ["greedyl", "vfir", "linearblend",
                                    "weave", "yadif"])
def test_split_invariance_temporal(method):
    planes = frames(6, seed=4)
    a = run_elem(make_elem(method), planes, ticks=1)
    b = run_elem(make_elem(method), planes, ticks=3)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


@pytest.mark.parametrize("strange", [False, True])
def test_tomsmocomp_gold(strange):
    planes = frames(2, seed=5)
    d = make_elem("tomsmocomp", strange_bob=strange)
    out = run_elem(d, planes, ticks=1)
    for pi, p in enumerate(planes):
        S = field_seq(p.astype(np.int64))
        assert out[pi].shape[0] == len(S)     # spatial: every field out
        for j, (l1f, par, _) in enumerate(S):
            exp = gold_tomsmocomp_frame(l1f, par, strange)
            got = out[pi][j].astype(np.int64)
            assert np.array_equal(got, exp), f"plane {pi} field {j}"


def test_greedyl_uses_true_neighbor_fields():
    planes = frames(3, seed=6)
    d = make_elem("greedyl")
    out = run_elem(d, planes, ticks=1)
    p = planes[0].astype(np.int64)
    S = field_seq(p)
    # check one synthesized line of output field j=2 (top field of frame 1)
    j = 2
    l1f, par, fi = S[j]
    assert par == 0
    older, newer = S[j - 1][0], S[j + 1][0]
    src = p[fi]
    # missing row 3: t=src row 2, b=src row 4, m1=older line 1, mp=newer 1
    t, b = src[2], src[4]
    m1, mp = older[1], newer[1]
    avg = (t + b + 1) >> 1
    best = np.where(np.abs(m1 - avg) > np.abs(mp - avg), mp, m1)
    exp = np.clip(best, np.maximum(np.minimum(t, b) - 15, 0),
                  np.minimum(np.maximum(t, b) + 15, 255))
    assert np.array_equal(out[0][j][3].astype(np.int64), exp)


def test_fields_top_bottom():
    planes = frames(4, seed=7)
    d = make_elem("linear", **{"fields": "top"})
    out = run_elem(d, planes, ticks=2)
    assert out[0].shape[0] == 4          # one output per frame
    # kept rows are the top field
    for i in range(4):
        assert np.array_equal(out[0][i][0::2],
                              planes[0][i][0::2].astype(out[0].dtype))


class TestDeintKernel:
    """ops/deint_kernel.py: the fused TPU fast path, run through the
    Pallas interpreter so CPU CI checks the exact kernel logic the
    TPU executes (bit-parity verified on hardware as well)."""

    def _gold(self, plane, method, parity0):
        h = plane.shape[-2]
        src16 = plane.astype(np.int16)
        iu = np.clip(np.arange(h) - 1, 0, h - 1)
        idn = np.clip(np.arange(h) + 1, 0, h - 1)
        t, b = src16[:, iu], src16[:, idn]
        interp = (t if method == "scalerbob"
                  else ((t + b + 1) >> 1)).astype(np.uint8)
        m = (np.arange(h) % 2 == 0)[:, None]
        p0 = np.where(m, plane, interp)
        p1 = np.where(~m, plane, interp)
        first, second = (p0, p1) if parity0 == 0 else (p1, p0)
        return np.stack([first, second], axis=1)

    def test_bit_parity_interpret(self):
        from gstreamer_tpu.ops.deint_kernel import deint_both_parities
        rng = np.random.default_rng(7)
        plane = rng.integers(0, 256, (3, 64, 256), dtype=np.uint8)
        for method in ("linear", "scalerbob"):
            for parity0 in (0, 1):
                out = np.asarray(deint_both_parities(
                    plane, method, parity0, interpret=True))
                assert np.array_equal(
                    out, self._gold(plane, method, parity0)), (
                        method, parity0)

    def test_unaligned_width(self):
        from gstreamer_tpu.ops.deint_kernel import deint_both_parities
        rng = np.random.default_rng(8)
        plane = rng.integers(0, 256, (2, 30, 96), dtype=np.uint8)
        out = np.asarray(deint_both_parities(plane, "linear", 0,
                                             interpret=True))
        assert np.array_equal(out, self._gold(plane, "linear", 0))

    def test_applicable_bounds(self):
        from gstreamer_tpu.ops.deint_kernel import applicable
        assert applicable(1080, 1920)
        assert applicable(540, 960)
        assert not applicable(2160, 3840)     # 4K exceeds VMEM cap
        assert not applicable(3, 128)         # odd height
