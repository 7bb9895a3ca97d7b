"""Chroma up/down-sampling with the reference's exact integer filters.

TPU-native re-design of GstVideoChromaResample
(subprojects/gst-plugins-base/gst-libs/gst/video/video-chroma.c —
MAKE_UPSAMPLE_H2 :277, _V2 :309, cosited variants, downsamplers :396;
vertical line grouping from video-converter.c do_upsample_lines with
v_resamplers offsets video-chroma.c:995).

Instead of the reference's per-line in-place filters driven by a line
cache, we express each filter as a whole-plane vectorized function of the
full canonical image — identical integer arithmetic, evaluated in one XLA
op over (..., H, W) channel planes.

Filter identities (verified against the reference's line grouping):

* 2x up, non-cosited (v_resamplers {up_v2, n_lines=2, offset=-1} — pairs
  are (2k-1, 2k), chroma c[k-1], c[k]):
    out[0]    = c[0]
    out[2k-1] = (3*c[k-1] +   c[k] + 2) >> 2
    out[2k]   = (  c[k-1] + 3*c[k] + 2) >> 2
    out[last] = c[last//2]                 (clamped edge group)
* 2x up, cosited: even samples unchanged, odd = (c[i] + c[i+1] + 1) >> 1
* 2x down, non-cosited: c[k] = (p[2k] + p[2k+1] + 1) >> 1
* 2x down, cosited: c[0] = (3p[0] + p[1] + 2) >> 2,
    c[k] = (p[2k-1] + 2*p[2k] + p[2k+1] + 2) >> 2  (FILT_1_2_1),
    tail (odd width): (p[i-1] + 3*p[i] + 2) >> 2
* 4x variants use the FILT_7_1/5_3/3_5/1_7 and FILT_1_3_3_1 kernels.

All functions take and return the *full-resolution* nearest-duplicated
channel plane (what :func:`gstreamer_tpu.video.format.unpack` produces) so
they compose directly in the converter chain.
"""

from __future__ import annotations


def _pad_edge_last(xp, a, axis, before, after):
    pads = [(0, 0)] * a.ndim
    pads[axis] = (before, after)
    return xp.pad(a, pads, mode="edge")


def _take(a, axis, start, stop, step=1):
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(start, stop, step)
    return a[tuple(sl)]


def _interleave(xp, a, b, axis):
    """Interleave two equally-shaped arrays along axis: a0 b0 a1 b1 ..."""
    st = xp.stack([a, b], axis=axis + 1 if axis >= 0 else a.ndim + axis + 1)
    shape = list(a.shape)
    ax = axis if axis >= 0 else a.ndim + axis
    shape[ax] = shape[ax] * 2
    return st.reshape(shape)


def up2(xp, plane, axis, cosited: bool):
    """2x chroma upsample along `axis` of a nearest-duplicated plane.

    `plane` has full resolution N with samples duplicated in pairs
    (plane[2k] == plane[2k+1] == c[k], except a trailing odd sample)."""
    n = plane.shape[axis]
    c = _take(plane, axis, 0, None, 2)          # the true chroma samples
    nc = c.shape[axis]
    cn = _take(_pad_edge_last(xp, c, axis, 0, 1), axis, 1, nc + 1)  # c[k+1]
    if cosited:
        # even positions keep c[k]; odd = (c[k] + c[k+1] + 1) >> 1
        # (last odd: edge pad gives (c+c+1)>>1 = c, matching the untouched
        # trailing duplicate in the reference loop bound i < width-1)
        odd = (c + cn + 1) >> 1
        out = _interleave(xp, c, odd, axis)
    else:
        cp = _take(_pad_edge_last(xp, c, axis, 1, 0), axis, 0, nc)  # c[k-1]
        # out[2k]   = (c[k-1] + 3*c[k] + 2) >> 2  (k=0 edge: = c[0] exactly)
        # out[2k+1] = (3*c[k] + c[k+1] + 2) >> 2  (last: edge -> c, matching
        #             the clamped trailing group)
        even_pos = (cp + 3 * c + 2) >> 2
        odd_pos = (3 * c + cn + 2) >> 2
        out = _interleave(xp, even_pos, odd_pos, axis)
    return _take(out, axis, 0, n)


def up2_half(xp, c, axis, cosited: bool, out_size: int):
    """2x chroma upsample DIRECTLY from the subsampled plane (no wasteful
    nearest-duplication round-trip through HBM).  `c` holds the true
    chroma samples along `axis`; identical arithmetic to up2() (which
    extracts c = plane[::2] from the duplicated layout)."""
    nc = c.shape[axis]
    cn = _take(_pad_edge_last(xp, c, axis, 0, 1), axis, 1, nc + 1)  # c[k+1]
    if cosited:
        odd = (c + cn + 1) >> 1
        out = _interleave(xp, c, odd, axis)
    else:
        cp = _take(_pad_edge_last(xp, c, axis, 1, 0), axis, 0, nc)  # c[k-1]
        even_pos = (cp + 3 * c + 2) >> 2
        odd_pos = (3 * c + cn + 2) >> 2
        out = _interleave(xp, even_pos, odd_pos, axis)
    n = out.shape[axis]
    if out_size < n:
        out = _take(out, axis, 0, out_size)
    elif out_size > n:   # odd full size: trailing sample = duplicate
        out = xp.concatenate(
            [out, _take(out, axis, n - 1, n)], axis=axis)
    return out


def up2_phases(xp, c, axis, cosited: bool):
    """2x chroma upsample WITHOUT interleaving: returns (even, odd) phase
    arrays such that full[2k] = even[k], full[2k+1] = odd[k].

    Identical arithmetic to up2_half; skipping the interleave avoids a
    minor-dim relayout on TPU — downstream scaling contracts the phases
    against the tap matrix's even/odd columns instead (bit-identical,
    the parity split happens before the fixed-point rounding)."""
    nc = c.shape[axis]
    cn = _take(_pad_edge_last(xp, c, axis, 0, 1), axis, 1, nc + 1)  # c[k+1]
    if cosited:
        return c, (c + cn + 1) >> 1
    cp = _take(_pad_edge_last(xp, c, axis, 1, 0), axis, 0, nc)      # c[k-1]
    return (cp + 3 * c + 2) >> 2, (3 * c + cn + 2) >> 2


def down2(xp, plane, axis, cosited: bool):
    """2x chroma downsample along axis; output written back at duplicated
    full resolution (pack() then selects the even samples)."""
    n = plane.shape[axis]
    if cosited:
        p_prev = _take(_pad_edge_last(xp, plane, axis, 1, 0), axis, 0, n)
        p_next = _take(_pad_edge_last(xp, plane, axis, 0, 1), axis, 1, n + 1)
        res = (p_prev + 2 * plane + p_next + 2) >> 2
        c = _take(res, axis, 0, None, 2)
        nc = c.shape[axis]
        # c[0] special-case: FILT_3_1(p0, p1); last chroma group:
        # FILT_1_3(p[ie-1], p[ie]) per the reference loop tail (i < width-2).
        first = (3 * _take(plane, axis, 0, 1) + _take(plane, axis, 1, 2) + 2) >> 2
        ie = 2 * (nc - 1)
        last = (_take(plane, axis, ie - 1, ie) + 3 * _take(plane, axis, ie, ie + 1)
                + 2) >> 2
        mid = _take(c, axis, 1, nc - 1)
        c = xp.concatenate([first, mid, last], axis=axis)
    else:
        a = _take(plane, axis, 0, None, 2)
        b = _take(_pad_edge_last(xp, plane, axis, 0, 1), axis, 1, n + 1, 2)
        if b.shape[axis] > a.shape[axis]:
            b = _take(b, axis, 0, a.shape[axis])
        c = (a + b + 1) >> 1
    # re-duplicate to full resolution
    out = xp.repeat(c, 2, axis=axis)
    return _take(out, axis, 0, n)


def up4(xp, plane, axis, cosited: bool):
    """4x chroma upsample (Y41B). Non-cosited FILT_7_1/5_3/3_5/1_7."""
    n = plane.shape[axis]
    c = _take(plane, axis, 0, None, 4)
    nc = c.shape[axis]
    cp = _take(_pad_edge_last(xp, c, axis, 1, 0), axis, 0, nc)  # c[k-1]
    if cosited:
        cn = _take(_pad_edge_last(xp, c, axis, 0, 1), axis, 1, nc + 1)
        q1 = (3 * c + cn + 2) >> 2
        q2 = (c + cn + 1) >> 1
        q3 = (c + 3 * cn + 2) >> 2
        groups = [c, q1, q2, q3]
        out = xp.stack(groups, axis=axis + 1 if axis >= 0 else plane.ndim + axis + 1)
        shape = list(c.shape)
        ax = axis if axis >= 0 else plane.ndim + axis
        shape[ax] *= 4
        out = out.reshape(shape)
        return _take(out, axis, 0, n)
    # Non-cosited: the reference loop (MAKE_UPSAMPLE_H4, i from 2 step 4)
    # writes positions 4k+2..4k+5 from (c[k], c[k+1]); positions 0,1 keep c[0].
    w1 = (7 * c + cp + 4) >> 3   # pos 4k+2 uses (a=c[k-1]? see below)
    # Re-derive with the loop: i = 2 + 4m writes p[i..i+3] from a=c[m], b=c[m+1]:
    #   p[4m+2] = FILT_7_1(a,b); p[4m+3] = FILT_5_3(a,b)
    #   p[4m+4] = FILT_3_5(a,b); p[4m+5] = FILT_1_7(a,b)
    cn = _take(_pad_edge_last(xp, c, axis, 0, 1), axis, 1, nc + 1)
    f71 = (7 * c + cn + 4) >> 3
    f53 = (5 * c + 3 * cn + 4) >> 3
    f35 = (3 * c + 5 * cn + 4) >> 3
    f17 = (c + 7 * cn + 4) >> 3
    ax = axis if axis >= 0 else plane.ndim + axis
    st = xp.stack([f71, f53, f35, f17], axis=ax + 1)
    shape = list(c.shape)
    shape[ax] *= 4
    tail = st.reshape(shape)                   # starts at position 2
    head = _take(plane, axis, 0, 2)            # positions 0,1 = c[0]
    out = xp.concatenate([head, tail], axis=ax)
    return _take(out, axis, 0, n)


def down4(xp, plane, axis, cosited: bool):
    """4x chroma downsample: FILT_1_3_3_1 over each group of 4."""
    n = plane.shape[axis]
    ax = axis if axis >= 0 else plane.ndim + axis
    ngroups = n // 4
    trimmed = _take(plane, axis, 0, ngroups * 4)
    shape = list(trimmed.shape)
    shape[ax] = ngroups
    shape.insert(ax + 1, 4)
    g = trimmed.reshape(shape)

    def pick(i):
        sl = [slice(None)] * g.ndim
        sl[ax + 1] = i
        return g[tuple(sl)]

    c = (pick(0) + 3 * (pick(1) + pick(2)) + pick(3) + 4) >> 3
    out = xp.repeat(c, 4, axis=ax)
    if out.shape[ax] < n:   # tail samples keep original values
        out = xp.concatenate([out, _take(plane, axis, out.shape[ax], n)], axis=ax)
    return out


def down2_interlaced(xp, plane, axis, cosited: bool):
    """2x vertical chroma downsample for INTERLACED content.

    The vertical filter is a passthrough stub in the reference
    (video-chroma.c MAKE_DOWNSAMPLE_VI2 :461 '/* FIXME */', dispatch
    n_lines=1 :1018 'IMPLEMENT ME'), so the row selection is done by
    the 4:2:0 PACK: IS_CHROMA_LINE_420 interlaced is !(y & 2) and the
    target row is GET_UV_420(y) (video-format.c :71,:80) — chroma row c
    comes from full row (c & ~1) * 2 + (c & 1), i.e. rows 0,1,4,5,8,9…"""
    del cosited  # both variants hit the same stub in the reference
    ax = axis if axis >= 0 else plane.ndim + axis
    n = plane.shape[ax]
    cs = np.arange((n + 1) // 2)
    rows = np.minimum((cs & ~1) * 2 + (cs & 1), n - 1)
    sl = [slice(None)] * plane.ndim
    sl[ax] = rows
    return plane[tuple(sl)]


def up2_interlaced(xp, plane, axis, cosited: bool):
    """2x vertical chroma upsample for INTERLACED content
    (video-chroma.c MAKE_UPSAMPLE_VI2 :345, line groups of 4 at offset
    -2 per v_resamplers[] :1017).

    `plane` is the nearest-duplicated full-res plane where chroma lines
    alternate fields (duplicated pairs per field).  Each group of 4
    lines (4g-2 .. 4g+1, edges clamped) maps to
        l0' = (5*l0 + 3*l2 + 4) >> 3      l1' = (7*l1 + l3 + 4) >> 3
        l2' = (l0 + 7*l2 + 4) >> 3        l3' = (3*l1 + 5*l3 + 4) >> 3
    Cosited interlaced variants are unimplemented in the reference
    (v_resamplers "IMPLEMENT ME" :1021) — identity there, like the
    reference's fallback."""
    if cosited:
        return plane   # reference: not implemented -> passthrough
    ax = axis if axis >= 0 else plane.ndim + axis
    n = plane.shape[ax]

    def line(i):
        i = min(max(i, 0), n - 1)
        return _take(plane, ax, i, i + 1)

    outs = []
    g = -1
    # groups start at 4g+2 offset -2 => group starts at lines -2, 2, 6, ...
    start = -2
    rows = [None] * n
    s = start
    while s < n:
        l0, l1, l2, l3 = (line(s), line(s + 1), line(s + 2), line(s + 3))
        vals = [(5 * l0 + 3 * l2 + 4) >> 3,
                (7 * l1 + l3 + 4) >> 3,
                (l0 + 7 * l2 + 4) >> 3,
                (3 * l1 + 5 * l3 + 4) >> 3]
        for k in range(4):
            idx = s + k
            if 0 <= idx < n:
                rows[idx] = vals[k]
        s += 4
    return xp.concatenate(rows, axis=ax)
