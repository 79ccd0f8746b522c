"""ctypes loader for the native TIFF codec (builds with g++ on first use).

The shared library is compiled lazily into this directory and cached; if no
toolchain is available the import degrades gracefully and ``io/tiff.py``
falls back to its pure-Python writer. No pybind11: the C ABI surface is two
functions, ctypes is enough.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("rescan_line_sted_tpu")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tiff_fast.cpp")
_LIB = os.path.join(_DIR, "_tiff_fast.so")
_lock = threading.Lock()
_lib = None
_tried = False

_SAMPLE_FORMAT = {np.dtype(np.uint8): 1, np.dtype(np.uint16): 1,
                  np.dtype(np.float32): 3, np.dtype(np.float64): 3}


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC,
                     "-lpthread"],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB)
            lib.tiff_encoded_size.restype = ctypes.c_uint64
            lib.tiff_encoded_size.argtypes = [ctypes.c_uint32] * 4
            lib.tiff_encode.restype = ctypes.c_int
            lib.tiff_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
                ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
                ctypes.c_void_p, ctypes.c_int]
            _lib = lib
        except Exception as e:  # toolchain missing / build failure
            logger.info("native TIFF codec unavailable (%s); "
                        "using pure-Python writer", e)
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def tiff_encode_native(arr: np.ndarray,
                       num_threads: int = 8) -> np.ndarray | None:
    """Encode [N, H, W] as TIFF bytes (uint8 array), or None if the codec is
    unavailable or the stack doesn't fit TIFF's 32-bit offsets."""
    lib = _load()
    if lib is None or arr.dtype not in _SAMPLE_FORMAT:
        return None
    arr = np.ascontiguousarray(arr)
    n, h, w = arr.shape
    size = lib.tiff_encoded_size(n, h, w, arr.dtype.itemsize)
    if size >= 2**32:
        return None
    out = np.empty(size, np.uint8)  # no zero-init, encoded in place
    rc = lib.tiff_encode(
        arr.ctypes.data_as(ctypes.c_void_p), n, h, w, arr.dtype.itemsize,
        _SAMPLE_FORMAT[arr.dtype],
        out.ctypes.data_as(ctypes.c_void_p), num_threads)
    if rc != 0:
        return None
    return out
