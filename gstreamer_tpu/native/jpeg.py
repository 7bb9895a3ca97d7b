"""ctypes bindings for the native JPEG entropy codec
(native/gtpu_jpeg.cpp).  Built on first use; the pure-Python coder in
codecs/jpeg.py stays as the gold fallback and both paths are asserted
bit-identical in tests."""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "gtpu_jpeg.cpp")
_SO = os.path.join(_HERE, "gtpu_jpeg.so")

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
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.gtpu_jpeg_decode_scan.restype = ctypes.c_int
    lib.gtpu_jpeg_decode_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ip)]
    lib.gtpu_jpeg_encode_scan.restype = ctypes.c_long
    lib.gtpu_jpeg_encode_scan.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ip), ctypes.c_char_p, ctypes.c_long]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _int_arr(vals):
    return (ctypes.c_int * len(vals))(*vals)


def decode_scan(scan: bytes, mcux: int, mcuy: int, restart: int,
                comps: List[dict], luts) -> Optional[List[np.ndarray]]:
    """comps: [{h, v, bw, bh, dc_idx, ac_idx}]; luts: (lut_val int16
    (ntab,65536), lut_len int8 (ntab,65536)).  Returns zigzag coeff
    arrays per component or None when the native path is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    lut_val, lut_len = luts
    lut_val = np.ascontiguousarray(lut_val, np.int16)
    lut_len = np.ascontiguousarray(lut_len, np.int8)
    outs = [np.zeros((c["bh"] * c["bw"] * 64,), np.int32) for c in comps]
    ptrs = (ctypes.POINTER(ctypes.c_int32) * len(comps))(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
          for o in outs])
    rc = lib.gtpu_jpeg_decode_scan(
        scan, len(scan), mcux, mcuy, restart, len(comps),
        _int_arr([c["h"] for c in comps]),
        _int_arr([c["v"] for c in comps]),
        _int_arr([c["bw"] for c in comps]),
        _int_arr([c["dc_idx"] for c in comps]),
        _int_arr([c["ac_idx"] for c in comps]),
        lut_val.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        lut_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ptrs)
    if rc != 0:
        return None
    return [o.reshape(-1, 64) for o in outs]


def encode_scan(mcux: int, mcuy: int, comps: List[dict],
                codes: np.ndarray, lens: np.ndarray,
                coef: List[np.ndarray]) -> Optional[bytes]:
    """codes: uint16 (ntab,256); lens: uint8 (ntab,256); coef: zigzag
    int32 (nblocks,64) per component."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint16)
    lens = np.ascontiguousarray(lens, np.uint8)
    bufs = [np.ascontiguousarray(c, np.int32) for c in coef]
    ptrs = (ctypes.POINTER(ctypes.c_int32) * len(comps))(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
          for b in bufs])
    cap = sum(b.size for b in bufs) * 4 + 4096
    out = ctypes.create_string_buffer(cap)
    n = lib.gtpu_jpeg_encode_scan(
        mcux, mcuy, len(comps),
        _int_arr([c["h"] for c in comps]),
        _int_arr([c["v"] for c in comps]),
        _int_arr([c["bw"] for c in comps]),
        _int_arr([c["dc_idx"] for c in comps]),
        _int_arr([c["ac_idx"] for c in comps]),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ptrs, out, cap)
    if n < 0:
        return None
    return out.raw[:n]
