"""ctypes bindings for the native host runtime (``native/ured_native.cpp``).

The library is built on demand with ``make -C native`` (g++ + OpenMP).  All
entry points have pure-numpy fallbacks, so the framework runs without a
toolchain; with the library, preprocessing-scale workloads (surface
sampling, kNN tables, host chamfer, connectivity) run multi-threaded native.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libured_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build_native(quiet: bool = True) -> bool:
    """Build the shared library; returns success."""
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True,
                       capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB_PATH) and auto_build:
        if not build_native():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_i64_p = ctypes.POINTER(ctypes.c_int64)
    c_i32_p = ctypes.POINTER(ctypes.c_int32)

    lib.sample_surface.argtypes = [
        c_double_p, ctypes.c_int64, c_i64_p, ctypes.c_int64, c_double_p,
        ctypes.c_int64, ctypes.c_uint64, c_double_p, c_double_p]
    lib.knn_table.argtypes = [c_float_p, ctypes.c_int64, ctypes.c_int64,
                              c_i32_p]
    lib.nn_distance.argtypes = [c_float_p, ctypes.c_int64, c_float_p,
                                ctypes.c_int64, c_float_p, c_i32_p,
                                c_float_p, c_i32_p]
    lib.min_pair_distance.argtypes = [c_float_p, ctypes.c_int64, c_float_p,
                                      ctypes.c_int64, c_float_p]
    lib.min_pair_distance.restype = ctypes.c_float
    _lib = lib
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def sample_surface_native(verts: np.ndarray, faces: np.ndarray,
                          vertex_mat: np.ndarray, n: int,
                          seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Native area-weighted surface sampling -> (points [n,3], pa [3n,6]).

    Falls back to ``data.preprocessing.sample_surface_with_mat``.
    """
    lib = get_lib()
    if lib is None:
        from ured_tpu.data.preprocessing import sample_surface_with_mat

        rng = np.random.default_rng(seed)
        pa = sample_surface_with_mat(verts, faces, vertex_mat, n, rng,
                                     use_native=False)
        # points are pa @ default_param; callers that need them compute
        # that product themselves, so return NaNs to make misuse loud
        return np.full((n, 3), np.nan), pa
    verts = np.ascontiguousarray(verts, np.float64)
    faces = np.ascontiguousarray(faces, np.int64)
    va = np.ascontiguousarray(vertex_mat, np.float64)
    out_p = np.empty((n, 3), np.float64)
    out_pa = np.empty((3 * n, 6), np.float64)
    lib.sample_surface(_ptr(verts, ctypes.c_double), len(verts),
                       _ptr(faces, ctypes.c_int64), len(faces),
                       _ptr(va, ctypes.c_double),
                       n, seed,
                       _ptr(out_p, ctypes.c_double),
                       _ptr(out_pa, ctypes.c_double))
    return out_p, out_pa


def knn_table_native(points: np.ndarray, k: int) -> np.ndarray:
    """Exact kNN table [N, k] (self first).  numpy fallback if no lib."""
    lib = get_lib()
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    if lib is None:
        d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        return np.argsort(d, axis=1)[:, :k].astype(np.int32)
    out = np.empty((n, k), np.int32)
    lib.knn_table(_ptr(pts, ctypes.c_float), n, k,
                  _ptr(out, ctypes.c_int32))
    return out


def nn_distance_native(x: np.ndarray, y: np.ndarray):
    """Host bidirectional NN -> (d1, i1, d2, i2).  numpy fallback."""
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    lib = get_lib()
    if lib is None:
        d = ((x[:, None] - y[None]) ** 2).sum(-1)
        return (d.min(1).astype(np.float32), d.argmin(1).astype(np.int32),
                d.min(0).astype(np.float32), d.argmin(0).astype(np.int32))
    n, m = len(x), len(y)
    d1 = np.empty(n, np.float32)
    i1 = np.empty(n, np.int32)
    d2 = np.empty(m, np.float32)
    i2 = np.empty(m, np.int32)
    lib.nn_distance(_ptr(x, ctypes.c_float), n, _ptr(y, ctypes.c_float), m,
                    _ptr(d1, ctypes.c_float), _ptr(i1, ctypes.c_int32),
                    _ptr(d2, ctypes.c_float), _ptr(i2, ctypes.c_int32))
    return d1, i1, d2, i2


def min_pair_distance_native(a: np.ndarray, b: np.ndarray
                             ) -> Tuple[float, np.ndarray]:
    """(min distance, joint midpoint) between two clouds.  numpy fallback."""
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    lib = get_lib()
    if lib is None:
        d = ((a[:, None] - b[None]) ** 2).sum(-1)
        i, j = np.unravel_index(np.argmin(d), d.shape)
        return float(np.sqrt(d[i, j])), (a[i] + b[j]) / 2.0
    joint = np.empty(3, np.float32)
    dist = lib.min_pair_distance(_ptr(a, ctypes.c_float), len(a),
                                 _ptr(b, ctypes.c_float), len(b),
                                 _ptr(joint, ctypes.c_float))
    return float(dist), joint
