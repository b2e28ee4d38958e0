"""ctypes bindings for the native host-ops library (native/hostops.cpp).

Auto-builds ``libhostops.so`` with g++ on first use (cached); every function
has a numpy/cv2 fallback so the framework works without a toolchain.  Used by
the loaders for polygon rasterization and mask post-processing on the
CPU-starved TPU host.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhostops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                src = os.path.join(_NATIVE_DIR, "hostops.cpp")
                if not os.path.exists(src):
                    return None
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fill_polygon_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.resize_area_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.binarize_count_u8.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint8]
            lib.binarize_count_u8.restype = ctypes.c_int64
            lib.u8_to_f32_norm.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            _lib = lib
        except Exception:  # noqa: BLE001 - toolchain optional
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def fill_polygon(mask: np.ndarray, polygon: np.ndarray) -> np.ndarray:
    """Rasterize an (N, 2) int32 xy polygon into a uint8 HxW mask (255 fill).

    Native scanline fill; cv2.fillPoly fallback.  NOTE: the two rasterizers
    differ by <1px on boundary pixels (cv2 uses its own rounding); loaders
    treat either as ground truth.
    """
    assert mask.dtype == np.uint8 and mask.flags.c_contiguous
    lib = _load()
    poly = np.ascontiguousarray(polygon, np.int32)
    if lib is None:
        import cv2

        cv2.fillPoly(mask, [poly.reshape(-1, 1, 2)], 255)
        return mask
    xs = np.ascontiguousarray(poly[:, 0])
    ys = np.ascontiguousarray(poly[:, 1])
    lib.fill_polygon_u8(
        mask.ctypes.data, mask.shape[0], mask.shape[1],
        xs.ctypes.data, ys.ctypes.data, len(poly),
    )
    return mask


def resize_area(src: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Box-filter uint8 resize (mask downscale)."""
    lib = _load()
    if lib is None:
        import cv2

        return cv2.resize(src, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA)
    src = np.ascontiguousarray(src, np.uint8)
    dst = np.empty(out_hw, np.uint8)
    lib.resize_area_u8(src.ctypes.data, src.shape[0], src.shape[1],
                       dst.ctypes.data, out_hw[0], out_hw[1])
    return dst


def binarize_count(mask: np.ndarray, threshold: int = 0) -> int:
    """In-place binarize (>threshold -> 255) returning the positive count."""
    lib = _load()
    if lib is None:
        pos = mask > threshold
        mask[:] = np.where(pos, 255, 0)
        return int(pos.sum())
    mask = np.ascontiguousarray(mask, np.uint8)
    return int(lib.binarize_count_u8(mask.ctypes.data, mask.size, threshold))


def u8_to_f32(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 / 255 (native single pass)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        return img.astype(np.float32) / 255.0
    out = np.empty(img.shape, np.float32)
    lib.u8_to_f32_norm(img.ctypes.data, out.ctypes.data, img.size)
    return out
