"""ctypes bridge to the native PCD codec (native/pcd_codec.cpp).

Builds the shared library on first use if a compiler is available; callers
fall back to the pure-python codec when the native one can't be loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "pcd_codec.cpp")
_SO = os.path.join(
    os.path.expanduser("~"), ".cache", "rfnet_native", "libpcdcodec.so"
)


def _build() -> str | None:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.pcd_count.argtypes = [ctypes.c_char_p]
            lib.pcd_count.restype = ctypes.c_long
            lib.pcd_read.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
            ]
            lib.pcd_read.restype = ctypes.c_long
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def read_pcd_native(filename: str) -> np.ndarray | None:
    """Read xyz with the C++ codec; None if unavailable or on parse error."""
    lib = get_lib()
    if lib is None:
        return None
    path = filename.encode()
    n = lib.pcd_count(path)
    if n < 0:
        return None
    buf = np.empty((max(n, 1), 3), dtype=np.float32)
    got = lib.pcd_read(path, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got < 0:
        return None
    return buf[:got].astype(np.float64)
