"""ctypes loader for the SILK synthesis hot-loop shim
(native/gtpu_silk.cpp).  codecs/silk.py uses it when present; the
pure-Python fixed-point path is the specification and fallback."""

from __future__ import annotations

import ctypes
import os

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "..", "..", "native", "gtpu_silk.cpp")
_SO = os.path.join(_HERE, "gtpu_silk.so")

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("GTPU_SILK_NATIVE", "1") == "0":
        return None
    from ._build import ensure_built
    if not ensure_built(_SRC, _SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.gtpu_silk_decode_core.restype = ctypes.c_int32
    lib.gtpu_silk_decode_core.argtypes = [
        i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, i32p, i32p, i32p, i32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p, i32p, i32p]
    lib.gtpu_silk_resample_iirfir.restype = ctypes.c_int
    lib.gtpu_silk_resample_iirfir.argtypes = [
        i32p, i32p, i16p, i32p, i32p, ctypes.c_int32,
        i32p, ctypes.c_int, i32p, i32p]
    lib.gtpu_silk_nlsf2a.restype = None
    lib.gtpu_silk_nlsf2a.argtypes = [i32p, ctypes.c_int, i32p, i32p,
                                     i32p]
    _lib = lib
    return _lib
