"""ctypes bindings for the native image decoder/prefetcher (image_io.cc)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "image_io.cc")
_LIB_PATH = os.path.join(_HERE, "liborbslam_io.so")
_lib = None
_lock = threading.Lock()


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-lz", "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.orbio_decode.restype = ctypes.POINTER(ctypes.c_float)
        lib.orbio_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
        ]
        lib.orbio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.orbio_prefetcher_create.restype = ctypes.c_void_p
        lib.orbio_prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int
        ]
        lib.orbio_prefetcher_get.restype = ctypes.POINTER(ctypes.c_float)
        lib.orbio_prefetcher_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.orbio_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _take(lib, ptr, w, h) -> Optional[np.ndarray]:
    if not ptr:
        return None
    n = w.value * h.value
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy().reshape(h.value, w.value)
    lib.orbio_free(ptr)
    return arr


def decode_image(path: str) -> Optional[np.ndarray]:
    """Decode PNG/PGM/PPM to grayscale float32 (16-bit PNGs keep raw counts).
    Returns None and lets callers fall back to PIL when unavailable."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.orbio_decode(path.encode(), ctypes.byref(w), ctypes.byref(h))
    return _take(lib, ptr, w, h)


class Prefetcher:
    """Threaded read-ahead over a fixed list of image paths.

    Usage:
        pf = Prefetcher(paths, n_threads=3)
        for i in range(len(paths)):
            img = pf.get(i)     # blocks only if IO is behind
        pf.close()
    """

    def __init__(self, paths: Sequence[str], n_threads: int = 2, max_ahead: int = 8):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native image IO unavailable")
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = self._lib.orbio_prefetcher_create(
            arr, len(self._paths), n_threads, max_ahead
        )
        self._n = len(paths)

    def get(self, idx: int) -> Optional[np.ndarray]:
        if not (0 <= idx < self._n):
            raise IndexError(idx)
        w = ctypes.c_int()
        h = ctypes.c_int()
        ptr = self._lib.orbio_prefetcher_get(
            self._handle, idx, ctypes.byref(w), ctypes.byref(h)
        )
        return _take(self._lib, ptr, w, h)

    def close(self):
        if self._handle:
            self._lib.orbio_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
