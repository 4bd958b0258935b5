"""Native (C++) runtime components, loaded via ctypes.

The reference leaned on OpenCV/GDAL C++ for its host-side hot loops (SURVEY
§2.3); here the equivalents are first-party:

* ``td_trace_contours`` — Suzuki-Abe border following + CHAIN_APPROX_SIMPLE
  compression (replaces ``cv2.findContours``, reference ``prediction.py:232``)
* ``td_lzw_decode`` — TIFF LZW fast path for the GeoTIFF codec

The shared library is compiled on first use with g++ (cached next to the
sources); every entry point has a pure-Python/cv2 fallback so the package
works before/without the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "contour.cpp")
# .bin extension: keeps pkgutil from mistaking the ctypes
# library for a Python extension module
_SO = os.path.join(_HERE, "_td_native.bin")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        so = _SO if (os.path.exists(_SO)
                     and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)) else _build()
        if so is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _build_failed = True
            return None
        # Bind signatures defensively: a stale binary (git preserves no
        # mtimes, so a checked-in .bin older than the source still passes the
        # freshness check when g++ is absent) may lack newer symbols.
        # Missing OPTIONAL symbols (callers hasattr-guard them) must not
        # break the whole library; missing REQUIRED ones disable it.
        try:
            lib.td_trace_contours.restype = ctypes.c_int
            lib.td_trace_contours.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
            lib.td_lzw_decode.restype = ctypes.c_int
            lib.td_lzw_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
        except AttributeError:
            _build_failed = True
            return None
        for name, restype, argtypes in (
            ("td_resize_threshold", ctypes.c_int, [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_float]),
            ("td_simplify_dp", ctypes.c_int, [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.c_double, ctypes.POINTER(ctypes.c_uint8)]),
        ):
            try:
                fn = getattr(lib, name)
                fn.restype = restype
                fn.argtypes = argtypes
            except AttributeError:
                pass  # optional symbol; callers hasattr-guard
        _lib = lib
        return _lib


def trace_contours(mask: np.ndarray, include_holes: bool = True
                   ) -> List[np.ndarray]:
    """Binary mask (H, W) -> list of (N, 2) integer (x, y) boundary rings.

    Native path when built; falls back to ``cv2.findContours`` (which the
    reference used directly) otherwise.
    """
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    lib = get_lib()
    if lib is not None:
        # border following visits a boundary pixel at most 4 times, so
        # 4*h*w bounds the total points — point overflow (which the tracer
        # signals only by returning early) cannot occur.  Contour-count
        # overflow retries with a larger budget instead of silently
        # truncating (speckled masks can exceed any fixed count).
        max_pts = 4 * h * w + 1024
        max_ctr = 4096
        out_xy = np.empty(2 * max_pts, dtype=np.int32)
        while True:
            out_sizes = np.empty(max_ctr, dtype=np.int32)
            out_hole = np.empty(max_ctr, dtype=np.uint8)
            n = lib.td_trace_contours(
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
                out_xy.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out_hole.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                max_pts, max_ctr)
            if n < max_ctr or max_ctr >= h * w:
                break
            max_ctr *= 4
        contours = []
        off = 0
        for i in range(n):
            k = out_sizes[i]
            if include_holes or not out_hole[i]:
                contours.append(out_xy[2 * off: 2 * (off + k)].reshape(k, 2).copy())
            off += k
        return contours
    return _trace_contours_cv2(mask)


def resize_threshold_mask(mask: np.ndarray, out_h: int, out_w: int,
                          thresh: float = 127.5) -> np.ndarray:
    """Soft uint8 mask -> bilinear resize -> 0/1 binary mask, in one native
    pass (the per-detection host hot loop of mask polygonization; numpy
    fallback matches bit-for-bit)."""
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    lib = get_lib()
    if lib is not None and hasattr(lib, "td_resize_threshold"):
        out = np.empty((out_h, out_w), dtype=np.uint8)
        lib.td_resize_threshold(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            mask.shape[0], mask.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out_h, out_w, ctypes.c_float(thresh))
        return out
    from treedetection_tpu.prediction import _resize_mask_np
    m = _resize_mask_np(mask.astype(np.float32), out_h, out_w)
    return (m > thresh).astype(np.uint8)


def simplify_keep_flags(ring: np.ndarray, tolerance: float
                        ) -> Optional[np.ndarray]:
    """Native Douglas-Peucker keep flags for an OPEN (N, 2) float64 ring.

    Bit-identical keep set to the numpy stack DP in
    ``vector.polygon.simplify_polygon`` (the stitching host hot loop —
    reference ``helpers.py:463-464``).  None when the library is unavailable.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "td_simplify_dp"):
        return None
    ring = np.ascontiguousarray(ring, dtype=np.float64)
    n = len(ring)
    keep = np.empty(n, dtype=np.uint8)
    lib.td_simplify_dp(
        ring.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        ctypes.c_double(tolerance * tolerance),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.view(bool)


def _trace_contours_cv2(mask: np.ndarray) -> List[np.ndarray]:
    import cv2
    found, _ = cv2.findContours(mask, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
    return [c.reshape(-1, 2).astype(np.int32) for c in found]


def lzw_decode(data: bytes, expected: int) -> Optional[bytes]:
    """Native TIFF LZW decode; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    dst = np.empty(expected, dtype=np.uint8)
    rc = lib.td_lzw_decode(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), expected)
    if rc < 0:
        return None
    return dst[:rc].tobytes()
