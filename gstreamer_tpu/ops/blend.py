"""Alpha-blend kernels with the reference's exact integer math.

References (subprojects/gst-plugins-base/gst/compositor/):
* compositororc.orc compositor_orc_blend_u8 :20 —
    d = clamp_u8((d<<8 + (s-d)*alpha) >> 8)        (alpha in [0..256])
* compositor_orc_overlay_argb :295 — per-pixel source alpha OVER:
    a_s = div255(a_pix * a_pad);  s' = s * a_s
    a_d = div255(a_dst * (255 - a_s));  d' = d * a_d
    out = divluw(s' + d', a_s + a_d);  out_alpha = a_s + a_d
* div255w emulation (compositororc-dist.c:1959): (x * 0x8081) >> 23
* divluw emulation (:3345): b==0 ? 255 : clamp_u8(a / b)

These run over whole (batched) planes as single fused XLA ops — the
row-chunked task-pool threading of the reference (compositor.c:1853) is
replaced by data parallelism.
"""

from __future__ import annotations


def div255w(xp, x):
    """Exact ORC div255w: (x * 0x8081) >> 23 for x in [0, 65535]."""
    return (x * 0x8081) >> 23


def blend_plane(xp, dst, src, alpha_256: int):
    """compositor_orc_blend_u8: alpha_256 = pad alpha mapped to [0..256]
    (blend.c uses CLAMP(alpha*255... passed as s16 param).  dst/src int32
    planes of equal shape."""
    t = (dst << 8) + (src - dst) * alpha_256
    t = t >> 8
    return xp.clip(t, 0, 255)


def overlay_argb(xp, dst, src, alpha_256: int):
    """compositor_orc_overlay_argb (OVER operator, per-pixel alpha).

    dst/src: (..., 4) int32 canonical (A, c0, c1, c2).  alpha_256 is the
    pad alpha in [0..256] (the ORC param `alpha`)."""
    a_pix = src[..., 0]
    a_s = div255w(xp, a_pix * alpha_256 & 0xFFFF)
    s_wide = src * a_s[..., None]

    a_d = div255w(xp, (dst[..., 0] * (255 - a_s)) & 0xFFFF)
    d_wide = dst * a_d[..., None]

    acc = (s_wide + d_wide) & 0xFFFF
    a_out = (a_s + a_d) & 0xFF

    quotient = xp.clip(acc // xp.maximum(a_out, 1)[..., None], 0, 255)
    out = xp.where(a_out[..., None] == 0, 255, quotient)
    if hasattr(out, "at"):
        out = out.at[..., 0].set(a_out)
    else:
        out[..., 0] = a_out
    return out


def overlay_argb_addition(xp, dst, src, alpha_256: int):
    """compositor_orc_overlay_argb_addition (ADD operator): like OVER but
    the output alpha accumulates: a_factor = div255(a_pix*alpha),
    a_dst' = clamp(a_dst + a_factor)."""
    a_pix = src[..., 0]
    a_s = div255w(xp, (a_pix * alpha_256) & 0xFFFF)
    s_wide = src * a_s[..., None]
    a_fact = a_s
    a_d = div255w(xp, (dst[..., 0] * (255 - a_s)) & 0xFFFF)
    d_wide = dst * a_d[..., None]
    acc = (s_wide + d_wide) & 0xFFFF
    a_out_div = (a_s + a_d) & 0xFF
    denom = a_out_div
    quotient = xp.clip(acc // xp.maximum(denom, 1)[..., None], 0, 255)
    out = xp.where(denom[..., None] == 0, 255, quotient)
    a_new = xp.clip(dst[..., 0] + a_fact, 0, 255)
    if hasattr(out, "at"):
        out = out.at[..., 0].set(a_new)
    else:
        out[..., 0] = a_new
    return out


def source_plane(xp, dst, src, alpha_256: int):
    """SOURCE operator: plain replacement."""
    return src
