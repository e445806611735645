"""ctypes binding for the native C++ frame loader (runtime/frame_loader.cc).

Threaded depth-PNG prefetching: `NativeDepthLoader` decodes 16-bit grayscale
depth PNGs in a C++ worker pool ahead of the SLAM loop. Falls back to PIL if
the shared library has not been built (`make -C runtime`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "..", "..", "runtime",
                        "libframe_loader.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # try building
        mk = os.path.dirname(path)
        os.system(f"make -C {mk} >/dev/null 2>&1")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.fl_create.restype = ctypes.c_void_p
    lib.fl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                              ctypes.c_int, ctypes.c_int]
    lib.fl_destroy.argtypes = [ctypes.c_void_p]
    lib.fl_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.fl_get.argtypes = [ctypes.c_void_p, ctypes.c_int,
                           ctypes.POINTER(ctypes.c_uint16),
                           ctypes.POINTER(ctypes.c_int),
                           ctypes.POINTER(ctypes.c_int)]
    lib.fl_get.restype = ctypes.c_int
    lib.decode_depth.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_uint16),
                                 ctypes.c_int, ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    lib.decode_depth.restype = ctypes.c_int
    lib.fl_evict_below.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def decode_depth_png(path: str, max_pixels: int = 4096 * 4096) -> Optional[np.ndarray]:
    """One-shot native decode; None on failure (caller falls back to PIL)."""
    lib = _load_lib()
    if lib is None:
        return None
    buf = np.empty(max_pixels, np.uint16)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ok = lib.decode_depth(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        max_pixels, ctypes.byref(w), ctypes.byref(h))
    if ok != 1:
        return None
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class NativeDepthLoader:
    """Prefetching depth loader over a path list (single consumer)."""

    def __init__(self, paths: List[str], workers: int = 4,
                 cache_cap: int = 64, max_pixels: int = 4096 * 4096):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native frame loader unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.fl_create(arr, len(self._paths), workers, cache_cap)
        self._buf = np.empty(max_pixels, np.uint16)
        self._max_pixels = max_pixels

    def prefetch(self, start: int, count: int):
        self._lib.fl_prefetch(self._handle, start, count)

    def get(self, i: int) -> np.ndarray:
        w = ctypes.c_int()
        h = ctypes.c_int()
        ok = self._lib.fl_get(
            self._handle, i,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.byref(w), ctypes.byref(h))
        if ok != 1:
            raise IOError(f"native decode failed for frame {i}")
        return self._buf[: w.value * h.value].reshape(h.value, w.value).copy()

    def evict_below(self, i: int):
        self._lib.fl_evict_below(self._handle, i)

    def close(self):
        if self._handle:
            self._lib.fl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
