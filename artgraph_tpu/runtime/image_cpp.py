"""ctypes bindings for the native artdata decode/resize library.

Auto-builds libartdata.so with the bundled Makefile on first use (g++ +
libjpeg, both present in the image). All entry points degrade gracefully:
callers fall back to the PIL path when the library is unavailable or a file
isn't a decodable JPEG (e.g. PNGs keep going through PIL).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_RUNTIME_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libartdata.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            if os.environ.get("ARTGRAPH_NO_NATIVE"):
                _build_failed = True
                return None
            try:
                subprocess.run(["make", "-C", _RUNTIME_DIR, "-s"],
                               check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.artdata_decode_resize.restype = ctypes.c_int
        lib.artdata_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.artdata_resize.restype = ctypes.c_int
        lib.artdata_resize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.artdata_decode_batch.restype = ctypes.c_int
        lib.artdata_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_resize_native(path: str, size: int) -> Optional[np.ndarray]:
    """Decode+resize one JPEG file; None if unavailable or not decodable."""
    lib = _load()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    out = np.empty((size, size, 3), dtype=np.uint8)
    rc = lib.artdata_decode_resize(
        data, len(data), size, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def resize_native(image: np.ndarray, size: int) -> Optional[np.ndarray]:
    """PIL-exact bilinear resize of an RGB u8 array."""
    lib = _load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w = image.shape[:2]
    out = np.empty((size, size, 3), dtype=np.uint8)
    rc = lib.artdata_resize(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        size, size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def decode_batch_native(paths: Sequence[str], size: int,
                        threads: int = 4) -> Optional[tuple]:
    """Parallel decode+resize of a JPEG path list.

    Returns (batch [n, size, size, 3] u8, status [n] int) or None if the
    native library is unavailable. status[i] != 0 marks failed items (caller
    falls back to PIL for those rows).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), dtype=np.uint8)
    status = np.zeros((n,), dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.artdata_decode_batch(
        arr, n, size, size, threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, status
