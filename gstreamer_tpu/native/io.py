"""ctypes bindings for the native frame loader (native/gtpu_io.cpp).

Builds the shared object on first use if the toolchain is available;
everything degrades gracefully to the pure-Python readers when not.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "gtpu_io.cpp")
_SO = os.path.join(_HERE, "gtpu_io.so")

_lib = None
_tried = False


class Y4MInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("fps_n", ctypes.c_int32),
        ("fps_d", ctypes.c_int32),
        ("frame_size", ctypes.c_int32),
        ("n_frames", ctypes.c_int64),
        ("chroma", ctypes.c_char * 16),
    ]


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    from ._build import ensure_built
    if not ensure_built(_SRC, _SO, extra_flags=("-lpthread",)):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.gtpu_open_y4m.restype = ctypes.c_void_p
    lib.gtpu_open_y4m.argtypes = [ctypes.c_char_p, ctypes.POINTER(Y4MInfo)]
    lib.gtpu_open_raw.restype = ctypes.c_void_p
    lib.gtpu_open_raw.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.gtpu_n_frames.restype = ctypes.c_int64
    lib.gtpu_n_frames.argtypes = [ctypes.c_void_p]
    lib.gtpu_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gtpu_read_batch.restype = ctypes.c_int32
    lib.gtpu_read_batch.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                    ctypes.c_void_p]
    lib.gtpu_start_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                        ctypes.c_int32]
    lib.gtpu_get_batch.restype = ctypes.c_int32
    lib.gtpu_get_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int64)]
    lib.gtpu_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


class NativeY4MReader:
    """mmap + background-prefetch y4m reader."""

    def __init__(self, path: str, batch: int = 8, prefetch_slots: int = 3):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native io unavailable")
        self._lib = lib
        self.info = Y4MInfo()
        self._h = lib.gtpu_open_y4m(path.encode(), ctypes.byref(self.info))
        if not self._h:
            raise IOError(f"cannot open y4m {path!r}")
        self.batch = batch
        self._prefetching = False
        self._eos = False
        self._slots = prefetch_slots

    def start(self):
        self._lib.gtpu_start_prefetch(self._h, self.batch, self._slots)
        self._prefetching = True

    def next_batch(self) -> Optional[Tuple[np.ndarray, int]]:
        """(frames bytes (n, frame_size), first_frame_index) or None."""
        if self._eos:
            return None
        out = np.empty((self.batch, self.info.frame_size), np.uint8)
        first = ctypes.c_int64()
        if self._prefetching:
            got = self._lib.gtpu_get_batch(self._h, out.ctypes.data,
                                           ctypes.byref(first))
        else:
            first.value = 0
            got = self._lib.gtpu_read_batch(self._h, self.batch,
                                            out.ctypes.data)
        if got == 0:
            self._eos = True
            return None
        return out[:got], first.value

    def close(self):
        if self._h:
            self._lib.gtpu_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
