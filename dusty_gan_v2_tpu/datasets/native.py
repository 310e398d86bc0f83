"""ctypes bindings to the native (C++) data-loader kernels (csrc/projection.cpp).

The library is auto-built on first use if g++ is available; everything degrades
gracefully to the vectorized numpy implementations in datasets/kitti.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_LIB_DIR, "libdusty_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _LIB_DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.project_points_to_image.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.project_points_to_image.restype = ctypes.c_int
        lib.nearest_resize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.nearest_resize.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def project_points_to_image_native(
    points: np.ndarray, H: int, W: int, min_depth: float, max_depth: float,
    scan_unfolding: bool = True,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.zeros((H, W, 6), np.float32)
    rc = lib.project_points_to_image(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        H, W, ctypes.c_float(min_depth), ctypes.c_float(max_depth),
        int(scan_unfolding),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def nearest_resize_native(img: np.ndarray, shape) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    H, W, C = img.shape
    OH, OW = shape
    out = np.zeros((OH, OW, C), np.float32)
    rc = lib.nearest_resize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W, C, OH, OW,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None
