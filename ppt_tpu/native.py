"""ctypes bindings for the native host library (libppt_host.so).

Covers the reference's CPU-native components (SURVEY.md §2.3 items 4-5):
voxel-grid subsampling, KD-tree kNN (data pipeline), and the z-buffer
ball renderer (visualization). Builds the shared library on demand with
the in-tree Makefile; every entry point has the same numpy-in/numpy-out
contract as the torch wrappers it replaces.
"""

from __future__ import annotations

import ctypes
import functools
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libppt_host.so")


def build_native(force: bool = False) -> str:
    """Compile libppt_host.so if missing; returns its path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"] + (["-B"] if force else []),
            check=True,
        )
    return _LIB_PATH


@functools.lru_cache()
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_native())
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_int_p = ctypes.POINTER(ctypes.c_int)
    c_u8_p = ctypes.POINTER(ctypes.c_uint8)

    lib.ppt_grid_subsample.restype = ctypes.c_int
    lib.ppt_grid_subsample.argtypes = [
        c_float_p, ctypes.c_int, ctypes.c_float, c_float_p,
        c_float_p, ctypes.c_int, c_float_p,
    ]
    lib.ppt_knn.restype = None
    lib.ppt_knn.argtypes = [
        c_float_p, ctypes.c_int, c_float_p, ctypes.c_int, ctypes.c_int,
        c_int_p, c_float_p,
    ]
    lib.ppt_knn_batch.restype = None
    lib.ppt_knn_batch.argtypes = [
        c_float_p, ctypes.c_int, ctypes.c_int, c_float_p, ctypes.c_int,
        ctypes.c_int, c_int_p,
    ]
    lib.ppt_fps_batch.restype = None
    lib.ppt_fps_batch.argtypes = [
        c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_int_p,
    ]
    lib.ppt_render_balls.restype = None
    lib.ppt_render_balls.argtypes = [
        c_float_p, c_u8_p, ctypes.c_int, c_u8_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
    ]
    return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def grid_subsample(
    points: np.ndarray,
    cell: float,
    features: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Voxel-grid barycenter subsampling of one cloud [N, 3]."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = len(pts)
    out = np.empty_like(pts)
    if features is not None:
        feats = np.ascontiguousarray(features, dtype=np.float32)
        fdim = feats.shape[1]
        out_f = np.empty_like(feats)
    else:
        feats = np.zeros((n, 0), dtype=np.float32)
        fdim = 0
        out_f = feats
    m = _lib().ppt_grid_subsample(
        _fp(pts), n, ctypes.c_float(cell), _fp(out), _fp(feats), fdim,
        _fp(out_f),
    )
    return out[:m].copy(), (out_f[:m].copy() if fdim else None)


def knn(query: np.ndarray, support: np.ndarray, k: int) -> np.ndarray:
    """KD-tree kNN: [Nq, 3] x [Ns, 3] -> [Nq, k] indices, nearest first."""
    q = np.ascontiguousarray(query, dtype=np.float32)
    s = np.ascontiguousarray(support, dtype=np.float32)
    k = min(k, len(s))
    idx = np.empty((len(q), k), dtype=np.int32)
    _lib().ppt_knn(
        _fp(q), len(q), _fp(s), len(s), k,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), None,
    )
    return idx


def knn_batch(query: np.ndarray, support: np.ndarray, k: int) -> np.ndarray:
    """Batched kNN: [B, Nq, 3] x [B, Ns, 3] -> [B, Nq, k]."""
    q = np.ascontiguousarray(query, dtype=np.float32)
    s = np.ascontiguousarray(support, dtype=np.float32)
    B, nq, _ = q.shape
    ns = s.shape[1]
    k = min(k, ns)
    idx = np.empty((B, nq, k), dtype=np.int32)
    _lib().ppt_knn_batch(
        _fp(q), B, nq, _fp(s), ns, k,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return idx


def fps_batch(points: np.ndarray, npoint: int, start: int = 0) -> np.ndarray:
    """Batched farthest point sampling on the host: [B, N, 3] ->
    [B, npoint] int32 indices.

    Dataset-construction replacement for the per-item numpy FPS loop
    (reference ``data/dataset_3d.py:294-300``): same min-distance/argmax
    algorithm in C, ~100x faster than the Python loop, deterministic
    ``start`` instead of the reference's random start.
    """
    pts = np.ascontiguousarray(points, dtype=np.float32)
    B, n, _ = pts.shape
    npoint = min(npoint, n)
    idx = np.empty((B, npoint), dtype=np.int32)
    _lib().ppt_fps_batch(
        _fp(pts), B, n, npoint, start,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return idx


def render_balls(
    points: np.ndarray,
    colors: np.ndarray,
    size: Tuple[int, int] = (512, 512),
    radius: float = 6.0,
    background: Tuple[int, int, int] = (255, 255, 255),
) -> np.ndarray:
    """Render a cloud to an RGB image (z-buffered shaded discs).

    points: [N, 3] in roughly [-1, 1]; colors: [N, 3] uint8.
    Returns [H, W, 3] uint8. Replaces ``notebook/render_balls.so``.
    """
    pts = np.ascontiguousarray(points, dtype=np.float32)
    cols = np.ascontiguousarray(colors, dtype=np.uint8)
    h, w = size
    img = np.empty((h, w, 3), dtype=np.uint8)
    _lib().ppt_render_balls(
        _fp(pts), cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(pts), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        ctypes.c_float(radius), *background,
    )
    return img
