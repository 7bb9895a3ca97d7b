"""G.711 mu-law / A-law companding — exact ports of the reference's
law codecs (gst-plugins-good/gst/law/).

Semantics reproduced bit-for-bit:
* mu-law encode: mulaw-conversion.c:34-83 (BIAS 0x84, CLIP 32635,
  exp_lut = highest-set-bit table, ZEROTRAP off as in the reference
  build).  The -32768 edge goes through the same unsigned-wrap clip as
  the C code ((guint16)(-(-32768)) = 32768 > CLIP).
* mu-law decode: mulaw-conversion.c:101-122 (exp_lut[e] equals
  (0x84 << e) - 0x84, the closed form of the table).
* A-law encode: the algorithmic form at alaw-encode.c:241-305
  (val_seg segment search + mask 0xD5/0x55), which generates the
  default lookup table (alaw-encode.c:54) exactly — asserted against
  spot values of that table in tests.
* A-law decode: the algorithmic form at alaw-decode.c:96-113, which
  equals the default table at alaw-decode.c:55-89.

Everything is vectorized over whole sample blocks (VPU-friendly
elementwise int ops — shifts, selects, compares) so the per-sample C
loops become one fused XLA expression; works under jit on any backend.
"""

from __future__ import annotations

_BIAS = 0x84
_CLIP = 32635


def _np_like(x):
    """Pick numpy or jax.numpy to match the input array."""
    import numpy as np
    if isinstance(x, np.ndarray):
        return np
    import jax.numpy as jnp
    return jnp


def mulaw_encode(x):
    """int16 linear -> uint8 mu-law (mulaw-conversion.c:34)."""
    xp = _np_like(x)
    xi = x.astype(xp.int32)
    sign = (xp.right_shift(xi, 8) & 0x80)
    # C negates in gint16 (wraps at -32768) then compares the uint16
    # reinterpretation against CLIP
    mag = xp.where(sign != 0, (-xi) & 0xFFFF, xi)
    mag = xp.minimum(mag, _CLIP)
    s = mag + _BIAS
    t = xp.right_shift(s, 7) & 0xFF
    # exp_lut[t]: index of the highest set bit (0 for t in {0, 1})
    exponent = sum((t >= (1 << k)).astype(xp.int32) for k in range(1, 8))
    mantissa = xp.right_shift(s, exponent + 3) & 0x0F
    byte = ~(sign | (exponent << 4) | mantissa) & 0xFF
    return byte.astype(xp.uint8)


def mulaw_decode(u):
    """uint8 mu-law -> int16 linear (mulaw-conversion.c:101)."""
    xp = _np_like(u)
    b = (~u.astype(xp.int32)) & 0xFF
    sign = b & 0x80
    exponent = xp.right_shift(b, 4) & 0x07
    mantissa = b & 0x0F
    # table {0,132,396,924,1980,4092,8316,16764} == (0x84<<e) - 0x84
    linear = (xp.left_shift(_BIAS, exponent) - _BIAS) \
        + xp.left_shift(mantissa, exponent + 3)
    return xp.where(sign != 0, -linear, linear).astype(xp.int16)


def alaw_encode(x):
    """int16 linear -> uint8 A-law (alaw-encode.c:241-305)."""
    xp = _np_like(x)
    xi = x.astype(xp.int32)
    neg = xi < 0
    mask = xp.where(neg, 0x55, 0xD5)
    pcm = xp.where(neg, xp.minimum(-xi, 0x7FFF), xi)
    # val_seg(): bit length of pcm>>8 (alaw-encode.c:263-278)
    v = xp.right_shift(pcm, 8)
    seg = sum((v >= (1 << k)).astype(xp.int32) for k in range(7))
    aval = xp.where(
        pcm < 256,
        xp.right_shift(pcm, 4),
        (seg << 4) | (xp.right_shift(pcm, seg + 3) & 0x0F))
    return ((aval ^ mask) & 0xFF).astype(xp.uint8)


def alaw_decode(u):
    """uint8 A-law -> int16 linear (alaw-decode.c:96-113)."""
    xp = _np_like(u)
    a = u.astype(xp.int32) ^ 0x55
    t = a & 0x7F
    seg = xp.right_shift(t, 4) & 0x07
    small = xp.left_shift(t, 4) + 8
    big = xp.left_shift(((t & 0x0F) << 4) + 0x108,
                        xp.maximum(seg - 1, 0))
    mag = xp.where(t < 16, small, big)
    return xp.where((a & 0x80) != 0, mag, -mag).astype(xp.int16)
