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
            src = os.path.join(_NATIVE_DIR, "hostops.cpp")
            stale = (
                os.path.exists(src)
                and os.path.exists(_LIB_PATH)
                and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
            )
            if not os.path.exists(_LIB_PATH) or stale:
                if not os.path.exists(src) and not os.path.exists(_LIB_PATH):
                    return None
                cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src]
                built = False
                # Try the fullest build first, degrading: no libpng dev
                # files -> JPEG-only; no libjpeg either -> the pure
                # compute ops with the image section preprocessed out
                # (jpeg_*/image_* wrappers then fall back to imops).
                # ANY build failure (missing g++, timeout, compile error)
                # must not discard a previously working .so — fall through
                # to loading whatever exists on disk.
                if os.path.exists(src):
                    for extra in (["-ljpeg", "-lpng"],
                                  ["-ljpeg", "-DHOSTOPS_NO_PNG"],
                                  ["-DHOSTOPS_NO_JPEG", "-DHOSTOPS_NO_PNG"]):
                        try:
                            subprocess.run(cmd + extra, check=True,
                                           capture_output=True, timeout=120)
                            built = True
                            break
                        except Exception:  # noqa: BLE001 - toolchain optional
                            continue
                if not built and not os.path.exists(_LIB_PATH):
                    return None
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
            # JPEG entry points exist only when the lib linked against
            # libjpeg; absent symbols raise AttributeError on first touch,
            # so probe once and mark the capability.
            try:
                lib.jpeg_decode_resize_bgr.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ]
                lib.jpeg_decode_resize_bgr.restype = ctypes.c_int64
                lib.jpeg_read_resize_bgr.argtypes = [
                    ctypes.c_char_p, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ]
                lib.jpeg_read_resize_bgr.restype = ctypes.c_int64
                lib.ring_create.argtypes = [
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64,
                ]
                lib.ring_create.restype = ctypes.c_void_p
                lib.ring_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
                lib.ring_submit.restype = ctypes.c_int64
                lib.ring_get.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
                lib.ring_get.restype = ctypes.c_int64
                lib.ring_destroy.argtypes = [ctypes.c_void_p]
                lib.image_read_resize_bgr.argtypes = [
                    ctypes.c_char_p, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ]
                lib.image_read_resize_bgr.restype = ctypes.c_int64
                lib.hostops_has_png.restype = ctypes.c_int64
                lib._has_jpeg = True
                lib._has_png = bool(lib.hostops_has_png())
            except AttributeError:
                # An older prebuilt .so may lack the image_*/png probe
                # symbols even though the jpeg_* set linked.
                lib._has_jpeg = hasattr(lib, "ring_create")
                lib._has_png = False
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


# ------------------------------------------------------------- JPEG fast path


def jpeg_available() -> bool:
    """True when the native lib linked against libjpeg(-turbo)."""
    lib = _load()
    return lib is not None and getattr(lib, "_has_jpeg", False)


def png_available() -> bool:
    """True when the native lib also linked libpng (PNG rides the same
    fused read+decode+resize path and the decode ring)."""
    lib = _load()
    return lib is not None and getattr(lib, "_has_png", False)


_ring_exts: tuple[str, ...] | None = None


def ring_extensions() -> tuple[str, ...]:
    """File extensions the native decode path (and DecodeRing) handles.
    Cached — hot loader paths call this per image, and the lib's
    capabilities are fixed after the one-shot ``_load``."""
    global _ring_exts
    if _ring_exts is None:
        if not jpeg_available():
            _ring_exts = ()
        else:
            _ring_exts = (".jpg", ".jpeg") + (
                (".png",) if png_available() else ())
    return _ring_exts


def image_read_resize(path: str, out_hw: tuple[int, int],
                      fast_scale_to: int = 0) -> np.ndarray | None:
    """Fused file read + decode + bilinear resize for ANY supported format
    (magic-byte sniffed: JPEG, and PNG when libpng linked) to (h, w, 3)
    BGR u8.  Returns None when unavailable or decode fails (callers fall
    back to imops).  ``fast_scale_to`` applies to JPEGs only."""
    lib = _load()
    if lib is None or not lib._has_jpeg:
        return None
    if not hasattr(lib, "image_read_resize_bgr"):
        # Older prebuilt .so without the generic entry (no toolchain to
        # rebuild): keep the JPEG fast path alive instead of degrading
        # every read to the slow generic decoder.
        return jpeg_read_resize(path, out_hw, fast_scale_to)
    out = np.empty((out_hw[0], out_hw[1], 3), np.uint8)
    rc = lib.image_read_resize_bgr(path.encode(), out.ctypes.data,
                                   out_hw[0], out_hw[1], fast_scale_to)
    return out if rc == 0 else None


def jpeg_read_resize(path: str, out_hw: tuple[int, int],
                     fast_scale_to: int = 0) -> np.ndarray | None:
    """Fused JPEG file read + decode + bilinear resize to (h, w, 3) BGR u8.

    One native call replaces the reference's ``cv2.imread`` + ``cv2.resize``
    pair (``fish_segmentation.py:60-61`` semantics): no full-resolution
    intermediate crosses the Python boundary, and with ``fast_scale_to > 0``
    libjpeg prescales in the DCT domain (M/8 IDCT scaling) before the
    bilinear tap — the decode itself shrinks with the target size.

    Pixels agree with the cv2 pair within the +/-1-2 LSB tolerance class the
    repo's PIL fallback documents (data/imops.py:12-16).  Returns None when
    the native path is unavailable or decode fails (callers fall back to
    imops).
    """
    lib = _load()
    if lib is None or not lib._has_jpeg:
        return None
    out = np.empty((out_hw[0], out_hw[1], 3), np.uint8)
    rc = lib.jpeg_read_resize_bgr(path.encode(), out.ctypes.data,
                                  out_hw[0], out_hw[1], fast_scale_to)
    return out if rc == 0 else None


def jpeg_decode_resize(buf: bytes | np.ndarray, out_hw: tuple[int, int],
                       fast_scale_to: int = 0) -> np.ndarray | None:
    """As :func:`jpeg_read_resize` but from an in-memory JPEG byte buffer."""
    lib = _load()
    if lib is None or not lib._has_jpeg:
        return None
    arr = np.frombuffer(buf, np.uint8) if isinstance(buf, bytes) else \
        np.ascontiguousarray(buf, np.uint8)
    out = np.empty((out_hw[0], out_hw[1], 3), np.uint8)
    rc = lib.jpeg_decode_resize_bgr(arr.ctypes.data, arr.size, out.ctypes.data,
                                    out_hw[0], out_hw[1], fast_scale_to)
    return out if rc == 0 else None


class DecodeRing:
    """Threaded native image decode ring (native/hostops.cpp ring_*) —
    JPEG, plus PNG when the lib linked libpng (see :func:`ring_extensions`).

    The TPU-native form of the reference's 3 DataLoader worker processes
    (``train_multiclass.py:374-376``): C worker threads read + decode +
    resize into result slots entirely outside the GIL; ``submit`` is
    non-blocking and returns a sequence number, ``get`` blocks until that
    item is ready.  Backpressure sits at the decode stage — workers stall
    while ``capacity`` decoded items are unconsumed — so a whole epoch's
    file list can be submitted up front with pixel memory bounded by
    ``capacity + n_threads`` images.  Results must therefore be consumed
    roughly in submit order (a ``get`` more than ``capacity`` items ahead
    of the oldest unconsumed one deadlocks; ordered batch iteration never
    does that).

    Use as a context manager; ``get`` returns None for files that failed to
    read/decode (callers fall back to the generic imops path).
    """

    def __init__(self, out_hw: tuple[int, int], capacity: int = 64,
                 n_threads: int = 3, fast_scale_to: int = 0):
        lib = _load()
        if lib is None or not lib._has_jpeg:
            raise RuntimeError("native JPEG support unavailable "
                               "(check native_available()/jpeg_available())")
        self._lib = lib
        self._hw = (int(out_hw[0]), int(out_hw[1]))
        self._ptr = lib.ring_create(self._hw[0], self._hw[1],
                                    capacity, n_threads, fast_scale_to)

    def submit(self, path: str) -> int:
        """Enqueue a file (non-blocking); returns its sequence number."""
        if self._ptr is None:
            raise RuntimeError("DecodeRing is closed")
        seq = int(self._lib.ring_submit(self._ptr, path.encode()))
        if seq < 0:  # C side refused (ring shutting down)
            raise RuntimeError("DecodeRing rejected submit (ring closed)")
        return seq

    def get(self, seq: int) -> np.ndarray | None:
        """Block until item `seq` is decoded; (h, w, 3) BGR u8 or None."""
        if self._ptr is None:
            raise RuntimeError("DecodeRing is closed")
        out = np.empty((self._hw[0], self._hw[1], 3), np.uint8)
        ok = self._lib.ring_get(self._ptr, seq, out.ctypes.data)
        return out if ok else None

    def close(self) -> None:
        if self._ptr is not None:
            self._lib.ring_destroy(self._ptr)
            self._ptr = None

    def __enter__(self) -> "DecodeRing":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
