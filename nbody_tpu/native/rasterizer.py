"""ctypes binding for the native rasterizer (native/rasterizer.cpp)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    candidates = [
        os.path.join(here, "native", "libnbody_native.so"),
        os.path.join(os.path.dirname(__file__), "libnbody_native.so"),
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.nbody_splat_points.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                ]
                _LIB = lib
                return _LIB
            except OSError:
                continue
    return None


def available() -> bool:
    return _load() is not None


def splat(img: np.ndarray, px, py, size, colors) -> None:
    """Additive-splat points into img (H, W, 3) float32, in place."""
    lib = _load()
    assert lib is not None
    img_c = np.ascontiguousarray(img, np.float32)
    px = np.ascontiguousarray(px, np.float32)
    py = np.ascontiguousarray(py, np.float32)
    size = np.ascontiguousarray(size, np.float32)
    colors = np.ascontiguousarray(colors, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.nbody_splat_points(
        img_c.ctypes.data_as(fp),
        img.shape[0],
        img.shape[1],
        px.ctypes.data_as(fp),
        py.ctypes.data_as(fp),
        size.ctypes.data_as(fp),
        colors.ctypes.data_as(fp),
        px.shape[0],
    )
    if img_c is not img:
        img[:] = img_c
