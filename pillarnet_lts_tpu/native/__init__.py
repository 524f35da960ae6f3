"""ctypes bindings for the native CPU pipeline kernels (csrc/).

Auto-loads `csrc/libpillar_pipeline.so`, building it on first use when a
compiler is available; every entry point has a numpy fallback so the
framework runs without the native library.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(_CSRC, "libpillar_pipeline.so")
    src_path = os.path.join(_CSRC, "pillar_pipeline.cpp")
    stale = (
        not os.path.exists(so_path)
        or os.path.getmtime(so_path) < os.path.getmtime(src_path)
    )
    if stale:
        # the .so is never committed (built artifact); (re)build from source
        try:
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True,
                timeout=120,
            )
        except Exception:
            if not os.path.exists(so_path):
                return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    lib.points_in_rbbox.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.draw_gaussians.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_float,
    ]
    lib.box_collision_test.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.transform_sweep.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return _LIB


def available():
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def points_in_rbbox(points, boxes):
    """Native points-in-rotated-boxes; returns bool (P, N) or None if the
    library is unavailable."""
    lib = _load()
    if lib is None or boxes.shape[0] == 0:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    bxs = np.ascontiguousarray(boxes, dtype=np.float32)
    out = np.empty((pts.shape[0], bxs.shape[0]), np.uint8)
    lib.points_in_rbbox(
        _fptr(pts), pts.shape[0], pts.shape[1],
        _fptr(bxs), bxs.shape[0], bxs.shape[1], _u8ptr(out),
    )
    return out.astype(bool)


def draw_gaussians(heatmap, centers, radii, k=1.0):
    """Stamp multiple gaussians into one (H, W) heatmap plane in-place.
    Returns False if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    assert heatmap.dtype == np.float32 and heatmap.flags.c_contiguous
    c = np.ascontiguousarray(centers, dtype=np.float32)
    r = np.ascontiguousarray(radii, dtype=np.int32)
    lib.draw_gaussians(
        _fptr(heatmap), heatmap.shape[0], heatmap.shape[1],
        _fptr(c), r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        c.shape[0], ctypes.c_float(k),
    )
    return True


def box_collision_test(corners_a, corners_b):
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(corners_a, dtype=np.float32)
    b = np.ascontiguousarray(corners_b, dtype=np.float32)
    out = np.empty((a.shape[0], b.shape[0]), np.uint8)
    lib.box_collision_test(_fptr(a), a.shape[0], _fptr(b), b.shape[0],
                           _u8ptr(out))
    return out.astype(bool)


def transform_sweep(points, tf, time_lag):
    """(n, C) sweep points -> (n, C+1) keyframe-transformed + time channel."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(points, dtype=np.float32)
    dst = np.empty((src.shape[0], src.shape[1] + 1), np.float32)
    tf_ptr = None
    if tf is not None:
        tf_arr = np.ascontiguousarray(tf, dtype=np.float32)
        tf_ptr = _fptr(tf_arr)
    lib.transform_sweep(
        _fptr(src), src.shape[0], src.shape[1], tf_ptr,
        ctypes.c_float(time_lag), _fptr(dst),
    )
    return dst
