"""Native host-runtime components (C++ via ctypes; no pybind11 in image).

Builds lazily with g++ on first use; a failed build falls back to the numpy
implementations in the callers, so the framework never hard-requires a
toolchain at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_build", "libobjgan_native.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build() -> str:
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    src = os.path.join(_HERE, "rasterize.cc")
    if (not os.path.exists(_SO_PATH)
            or os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-o", _SO_PATH],
            check=True, capture_output=True,
        )
    return _SO_PATH


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build())
            lib.rasterize_polygon.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.rasterize_polygons.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            _LIB = lib
    return _LIB


def rasterize_polygon(poly: np.ndarray, size: int) -> np.ndarray:
    """poly (k, 2) float64 in [0,1] box-local coords -> (size, size) float32."""
    poly = np.ascontiguousarray(poly, np.float64)
    out = np.empty((size, size), np.float32)
    _lib().rasterize_polygon(
        poly.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(poly.shape[0]), int(size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def rasterize_polygons(polys, size: int) -> np.ndarray:
    """List of (k_i, 2) arrays -> (n, size, size) float32, one C call."""
    if not polys:
        return np.zeros((0, size, size), np.float32)
    flat = np.ascontiguousarray(np.concatenate(polys, axis=0), np.float64)
    offsets = np.zeros((len(polys) + 1,), np.int64)
    np.cumsum([p.shape[0] for p in polys], out=offsets[1:])
    out = np.empty((len(polys), size, size), np.float32)
    _lib().rasterize_polygons(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(polys), int(size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
