"""ctypes bindings for the native FLAC codec (native/gtpu_flac.cpp).
Built on first use; the pure-Python codec in codecs/flac.py is the
gold — tests assert the two produce bit-identical streams and
sample-identical decodes."""

from __future__ import annotations

import ctypes
import hashlib
import os
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "gtpu_flac.cpp")
_SO = os.path.join(_HERE, "gtpu_flac.so")

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    from ._build import ensure_built
    if not ensure_built(_SRC, _SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.gtpu_flac_decode.restype = ctypes.c_long
    lib.gtpu_flac_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.gtpu_flac_encode.restype = ctypes.c_long
    lib.gtpu_flac_encode.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    _lib = lib
    return _lib


def decode(data: bytes) -> Optional[Tuple[np.ndarray, int, int, int]]:
    """-> ((n, ch) int32, rate, channels, bps) or None (fallback)."""
    lib = get_lib()
    if lib is None:
        return None
    from ..codecs.flac import parse_stream_header
    si, _ = parse_stream_header(data)
    ch_n = max(si.channels, 1)
    cap = si.total_samples or (len(data) * 4 // ch_n + 65536)
    # total_samples is an untrusted 36-bit header field: a hostile
    # stream could claim 2^36 and trigger a multi-TB allocation.
    # Bound by the best possible FLAC expansion (a minimal ~6-byte
    # constant frame encodes <=65535 samples) and a 256 MiB ceiling;
    # the C decoder respects `cap` and stops there.
    max_expansion = (len(data) // 6 + 1) * 65535
    hard_cap = (256 << 20) // (4 * ch_n)
    cap = max(1, min(int(cap), max_expansion, hard_cap))
    out = np.zeros(int(cap) * si.channels, np.int32)
    ch = ctypes.c_int()
    rate = ctypes.c_int()
    bps = ctypes.c_int()
    n = lib.gtpu_flac_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(cap), ctypes.byref(ch), ctypes.byref(rate),
        ctypes.byref(bps))
    if n < 0:
        return None
    return (out[:n * ch.value].reshape(-1, ch.value), rate.value,
            ch.value, bps.value)


def encode(samples: np.ndarray, sample_rate: int, bps: int = 16,
           blocksize: int = 4096) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    flat = np.ascontiguousarray(samples, np.int32).ravel()
    cap = 1024 + n * ch * ((bps + 7) // 8 + 2)
    out = np.zeros(cap, np.uint8)
    wrote = lib.gtpu_flac_encode(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, ch, sample_rate, bps, blocksize,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if wrote < 0:
        return None
    blob = bytearray(out[:wrote].tobytes())
    # patch the MD5 the C side left zeroed (streaminfo bytes 26..42)
    from ..codecs.flac import _md5_raw_bytes
    nbytes = (bps + 7) // 8
    md5 = hashlib.md5()
    md5.update(_md5_raw_bytes(samples, nbytes))
    blob[26:42] = md5.digest()
    return bytes(blob)
