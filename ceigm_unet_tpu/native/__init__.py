"""Native (C++) host kernels for the CPU data pipeline.

Builds ``augwarp.cpp`` into ``_augwarp.so`` on first use (g++, ~1 s) and
exposes ctypes wrappers. Everything degrades gracefully: if the
toolchain or the build is unavailable the callers keep their pure
numpy/scipy paths. Disable explicitly with ``CEIGM_NATIVE_AUG=0``.

The build is multi-process safe: compilation goes to a unique temp file
followed by an atomic rename, so spawn-context loader workers racing on
first use each either see the finished .so or produce an identical one.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "augwarp.cpp")
_SO = os.path.join(_DIR, "_augwarp.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)  # atomic
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("CEIGM_NATIVE_AUG", "1") == "0":
            return None
        stale = (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # foreign/corrupt binary: rebuild once
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_SO)
            except OSError:
                return None
        try:
            _bind(lib)
        except AttributeError:
            # binary predates a symbol (mtime heuristic defeated, e.g.
            # by a checkout): force one rebuild
            if not _build():
                return None
            lib = ctypes.CDLL(_SO)
            try:
                _bind(lib)
            except AttributeError:
                return None
        _lib = lib
        return _lib


def _bind(lib) -> None:
    fp = ctypes.POINTER(ctypes.c_float)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.affine_warp_f32.argtypes = [
        fp, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_float, fp]
    lib.affine_warp_f32.restype = None
    lib.piecewise_warp_f32.argtypes = [
        fp, fp, ctypes.c_int, ctypes.c_int, dp, dp, ctypes.c_int,
        ctypes.c_float, fp, fp]
    lib.piecewise_warp_f32.restype = None
    lib.sep_resize_f32.argtypes = [
        fp, ctypes.c_int, ctypes.c_int,
        ip, fp, ctypes.c_int,
        ip, fp, ctypes.c_int,
        ctypes.c_int, fp, fp]
    lib.sep_resize_f32.restype = None


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def affine_warp(src: np.ndarray, m: np.ndarray, off: np.ndarray,
                order: int, cval: float = 0.0) -> np.ndarray:
    """scipy.ndimage.affine_transform(src, m, offset=off, order=order,
    mode='constant') on float32 2-D arrays, in one native pass."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src, np.float32)
    h, w = src.shape
    out = np.empty_like(src)
    lib.affine_warp_f32(
        _fptr(src), h, w,
        float(m[0, 0]), float(m[0, 1]), float(m[1, 0]), float(m[1, 1]),
        float(off[0]), float(off[1]), int(order), float(cval), _fptr(out))
    return out


def piecewise_warp(img: np.ndarray, lab: np.ndarray, aff: np.ndarray,
                   verts: np.ndarray, cval: float = 0.0):
    """Fused piecewise-affine warp of (image order-1, label order-0).

    aff:   (ns, 6) float64 [a00, a01, b0, a10, a11, b1] per triangle
           (cy = a00*y + a01*x + b0; cx = a10*y + a11*x + b1)
    verts: (ns, 6) float64 [y0, x0, y1, x1, y2, x2] per triangle
    """
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    lab = np.ascontiguousarray(lab, np.float32)
    aff = np.ascontiguousarray(aff, np.float64)
    verts = np.ascontiguousarray(verts, np.float64)
    ns = aff.shape[0]
    assert ns <= 256, "kernel caps the triangle table at 256"
    h, w = img.shape
    oimg = np.empty_like(img)
    olab = np.empty_like(lab)
    lib.piecewise_warp_f32(_fptr(img), _fptr(lab), h, w, _dptr(aff),
                           _dptr(verts), ns, float(cval), _fptr(oimg),
                           _fptr(olab))
    return oimg, olab


def sep_resize(src: np.ndarray, ys: np.ndarray, yw: np.ndarray,
               xs: np.ndarray, xw: np.ndarray, taps: int) -> np.ndarray:
    """Apply a separable banded linear resize operator (exact truncated
    scipy-zoom rows; see ops/resize.py:zoom_band) in one native pass."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src, np.float32)
    h, w = src.shape
    ho, wo = ys.shape[0], xs.shape[0]
    ip = ctypes.POINTER(ctypes.c_int32)
    tmp = np.empty((ho, w), np.float32)
    out = np.empty((ho, wo), np.float32)
    lib.sep_resize_f32(
        _fptr(src), h, w,
        ys.ctypes.data_as(ip), _fptr(yw), ho,
        xs.ctypes.data_as(ip), _fptr(xw), wo,
        int(taps), _fptr(tmp), _fptr(out))
    return out
