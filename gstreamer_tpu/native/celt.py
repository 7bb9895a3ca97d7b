"""ctypes loader for the CELT hot-loop shim (native/gtpu_celt.cpp).
codecs/celt.py uses it when present; the pure-Python path is the
specification and fallback (GTPU_CELT_NATIVE=0 forces it)."""

from __future__ import annotations

import ctypes
import os

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "..", "..", "native", "gtpu_celt.cpp")
_SO = os.path.join(_HERE, "gtpu_celt.so")

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("GTPU_CELT_NATIVE", "1") == "0":
        return None
    from ._build import ensure_built
    if not ensure_built(_SRC, _SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.gtpu_celt_pvq_v.restype = ctypes.c_uint64
    lib.gtpu_celt_pvq_v.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.gtpu_celt_cwrsi.restype = None
    lib.gtpu_celt_cwrsi.argtypes = [ctypes.c_int, ctypes.c_int,
                                    ctypes.c_uint64, i32p]
    lib.gtpu_celt_exp_rotation.restype = None
    lib.gtpu_celt_exp_rotation.argtypes = [
        f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.gtpu_celt_comb_filter.restype = None
    lib.gtpu_celt_comb_filter.argtypes = [
        f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, f64p, f64p, f64p,
        ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib
