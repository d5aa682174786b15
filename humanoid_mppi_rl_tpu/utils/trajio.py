"""ctypes bindings for the native CSV codec (native/trajio.cpp).

Compiles the shared library on first use (g++ -O3) into the package dir and
falls back to numpy loadtxt/savetxt when no toolchain is available — the
public API is identical either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "trajio.cpp")
_SO = os.path.join(_NATIVE_DIR, "libtrajio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.trajio_read_csv.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.trajio_read_csv.restype = ctypes.c_int
            lib.trajio_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
            lib.trajio_write_csv.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.trajio_write_csv.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def read_csv(path: str) -> np.ndarray:
    """CSV -> (rows, cols) float64 array (native parser, numpy fallback)."""
    lib = _load()
    if lib is None:
        return np.loadtxt(path, delimiter=",", ndmin=2)
    out = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.trajio_read_csv(path.encode(), ctypes.byref(out),
                             ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return np.loadtxt(path, delimiter=",", ndmin=2)
    n = rows.value * cols.value
    try:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.trajio_free(out)
    return arr.reshape(rows.value, cols.value)


def write_csv(path: str, arr: np.ndarray) -> None:
    lib = _load()
    a = np.ascontiguousarray(arr, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    if lib is None:
        np.savetxt(path, a, delimiter=",")
        return
    rc = lib.trajio_write_csv(
        path.encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        a.shape[0], a.shape[1])
    if rc != 0:
        np.savetxt(path, a, delimiter=",")
