"""ctypes bindings for the native host runtime (csrc/libndtslam.so).

Covers the host data plane in C++ like the reference does (parsing:
src/SlamLauncher.cpp:37-105; resampling: src/ScanPointResampler.cpp;
PCD export: include/ndt_slam/PointCloudMap.h:124-136). Every entry
point has a pure-Python fallback with identical semantics; callers go
through the dispatchers here and never need the library to exist.

The library is built on demand (`make -C csrc`) the first time it is
requested; failures degrade silently to the Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libndtslam.so"))

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
                ["make", "-C", os.path.abspath(_CSRC)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ndt_resample.restype = ctypes.c_int
    lib.ndt_resample.argtypes = [
        f32p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        f32p, ctypes.c_int,
    ]
    lib.ndt_tsukuba_parse.restype = ctypes.c_int64
    lib.ndt_tsukuba_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.ndt_tsukuba_counts.restype = ctypes.c_int
    lib.ndt_tsukuba_counts.argtypes = [ctypes.c_int64, i64p, i64p]
    lib.ndt_tsukuba_fill.restype = ctypes.c_int
    lib.ndt_tsukuba_fill.argtypes = [ctypes.c_int64, i64p, f32p, i64p, f32p]
    lib.ndt_tsukuba_free.restype = None
    lib.ndt_tsukuba_free.argtypes = [ctypes.c_int64]
    lib.ndt_write_pcd.restype = ctypes.c_int
    lib.ndt_write_pcd.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64]
    lib.ndt_carmen_parse.restype = ctypes.c_int64
    lib.ndt_carmen_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def resample_points(
    xy: np.ndarray, space: float = 0.05, space_thre: float = 0.25
) -> np.ndarray:
    """Native resampler; falls back to pre.resample.resample_points_np."""
    lib = _load()
    xy = np.ascontiguousarray(xy, dtype=np.float32).reshape(-1, 2)
    if lib is None:
        from ndt_slam_tpu.pre.resample import resample_points_np
        return resample_points_np(xy, space, space_thre)
    n = xy.shape[0]
    # worst case: one inserted point per step of `space` along the path
    cap = max(16, 4 * n + 16)
    out = np.empty((cap, 2), dtype=np.float32)
    m = lib.ndt_resample(_f32p(xy), n, space, space_thre, _f32p(out), cap)
    return out[:m].copy()


def read_tsukuba_log(path: str, sidelidar: bool = False) -> Optional[List]:
    """Native tsukuba parser; returns None when the library is absent
    (caller falls back to io.tsukuba.read_tsukuba_log)."""
    lib = _load()
    if lib is None:
        return None
    from ndt_slam_tpu.io.tsukuba import LogFrame

    h = lib.ndt_tsukuba_parse(path.encode(), int(sidelidar))
    if h < 0:
        raise FileNotFoundError(path)
    try:
        n_frames = np.zeros(1, np.int64)
        n_pts = np.zeros(1, np.int64)
        lib.ndt_tsukuba_counts(h, _i64p(n_frames), _i64p(n_pts))
        nf, npts = int(n_frames[0]), int(n_pts[0])
        stamps = np.zeros(nf, np.int64)
        poses = np.zeros((nf, 3), np.float32)
        offsets = np.zeros(nf + 1, np.int64)
        pts = np.zeros((npts, 2), np.float32)
        lib.ndt_tsukuba_fill(
            h, _i64p(stamps), _f32p(poses), _i64p(offsets), _f32p(pts)
        )
    finally:
        lib.ndt_tsukuba_free(h)
    return [
        LogFrame(
            stamp=int(stamps[i]),
            odo_pose=poses[i].copy(),
            scan_xy=pts[offsets[i]:offsets[i + 1]].copy(),
        )
        for i in range(nf)
    ]


def read_carmen_log(
    path: str,
    max_range: float = 50.0,
    fov_rad: float = np.pi,
    max_frames: Optional[int] = None,
) -> Optional[List]:
    """Native CARMEN parser (FLASER/ROBOTLASER1); returns None when the
    library is absent (caller falls back to io.carmen.read_carmen_log).
    Shares the counts/fill/free handle protocol with the tsukuba
    parser."""
    lib = _load()
    if lib is None:
        return None
    from ndt_slam_tpu.io.tsukuba import LogFrame

    h = lib.ndt_carmen_parse(
        path.encode(), float(max_range), float(fov_rad),
        -1 if max_frames is None else int(max_frames),
    )
    if h < 0:
        raise FileNotFoundError(path)
    try:
        n_frames = np.zeros(1, np.int64)
        n_pts = np.zeros(1, np.int64)
        lib.ndt_tsukuba_counts(h, _i64p(n_frames), _i64p(n_pts))
        nf, npts = int(n_frames[0]), int(n_pts[0])
        stamps = np.zeros(nf, np.int64)
        poses = np.zeros((nf, 3), np.float32)
        offsets = np.zeros(nf + 1, np.int64)
        pts = np.zeros((npts, 2), np.float32)
        lib.ndt_tsukuba_fill(
            h, _i64p(stamps), _f32p(poses), _i64p(offsets), _f32p(pts)
        )
    finally:
        lib.ndt_tsukuba_free(h)
    return [
        LogFrame(
            stamp=int(stamps[i]),
            odo_pose=poses[i].copy(),
            scan_xy=pts[offsets[i]:offsets[i + 1]].copy(),
        )
        for i in range(nf)
    ]


def save_pcd(path: str, xy: np.ndarray) -> bool:
    """Native ASCII PCD writer; False when unavailable (caller falls
    back to io.pcd.save_pcd)."""
    lib = _load()
    if lib is None:
        return False
    xy = np.ascontiguousarray(xy, dtype=np.float32).reshape(-1, 2)
    rc = lib.ndt_write_pcd(path.encode(), _f32p(xy), xy.shape[0])
    if rc != 0:
        raise OSError(f"ndt_write_pcd failed for {path}")
    return True
