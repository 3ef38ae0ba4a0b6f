"""Farthest-point sampling (host preprocessing: FPS keypoints / region
centers, reference core/csrc/fps + core/utils/data_utils.py:269).

Backends: native C++/OpenMP library (native/fps.cpp via ctypes; built by
native/build.sh, auto-built on first use if g++ is available) with a numpy
fallback of identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libself6dpp_native.so")
_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["sh", os.path.join(_REPO_ROOT, "native", "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.farthest_point_sampling.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def fps_numpy(points: np.ndarray, k: int, init_center: bool = True) -> np.ndarray:
    """Greedy FPS, numpy reference implementation."""
    n = len(points)
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if init_center:
        c = pts.mean(axis=0)
        cur = int(np.argmin(((pts - c) ** 2).sum(axis=1)))
    else:
        cur = 0
    mind = np.full(n, np.inf, dtype=np.float32)
    idx = np.empty(k, dtype=np.int32)
    for j in range(k):
        idx[j] = cur
        d = ((pts - pts[cur]) ** 2).sum(axis=1)
        np.minimum(mind, d, out=mind)
        cur = int(np.argmax(mind))
    return idx


def farthest_point_sampling(points: np.ndarray, k: int,
                            init_center: bool = True) -> np.ndarray:
    """Returns indices (k,) of FPS-selected points."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    lib = _load_native()
    if lib:
        out = np.empty(k, dtype=np.int32)
        lib.farthest_point_sampling(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(len(pts)), ctypes.c_int64(k),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int32(1 if init_center else 0))
        return out
    return fps_numpy(pts, k, init_center)


def fps_points(points: np.ndarray, k: int, init_center: bool = True) -> np.ndarray:
    return np.asarray(points)[farthest_point_sampling(points, k, init_center)]


def xyz_to_region(xyz: np.ndarray, fps_pts: np.ndarray,
                  mask: np.ndarray | None = None) -> np.ndarray:
    """Assign each (valid) pixel's object-frame xyz to its nearest FPS center,
    1-based (0 = background). Reference: core/utils/data_utils.py:269."""
    h, w = xyz.shape[:2]
    flat = xyz.reshape(-1, 3).astype(np.float32)
    fps_pts = np.asarray(fps_pts, np.float32)
    # argmin_k |x-c_k|^2 = argmin_k (|c_k|^2 - 2 x.c_k): one (P,3)@(3,K)
    # matmul instead of materializing the (P,K,3) difference tensor
    d = flat @ (-2.0 * fps_pts.T)
    d += (fps_pts * fps_pts).sum(-1)[None, :]
    region = d.argmin(axis=1).astype(np.int32).reshape(h, w) + 1
    if mask is not None:
        region = region * (mask > 0)
    return region


def xyz_to_region_batch(xyz: np.ndarray, fps_pts: np.ndarray,
                        mask: np.ndarray | None = None) -> np.ndarray:
    """Batched xyz_to_region: xyz (B,h,w,3), fps_pts (B,K,3), mask (B,h,w).
    One einsum replaces the per-sample python loop in the loader's finish
    stage (host-throughput item, BENCH_NOTES loader section)."""
    B, h, w, _ = xyz.shape
    flat = xyz.reshape(B, -1, 3).astype(np.float32)
    fps_pts = np.asarray(fps_pts, np.float32)
    # np.matmul dispatches to batched BLAS sgemm; np.einsum on 3-D operands
    # falls back to a C loop ~1.5x slower end-to-end (measured in the
    # loader bench — BENCH_NOTES loader section)
    d = flat @ (-2.0 * fps_pts.transpose(0, 2, 1))
    d += (fps_pts * fps_pts).sum(-1)[:, None, :]
    region = d.argmin(axis=2).astype(np.int32).reshape(B, h, w) + 1
    if mask is not None:
        region = region * (mask > 0)
    return region
