"""ASCII PCD export/import (reference: pcl::io::savePCDFileASCII via
PointCloudMap::saveGlobalMap, include/ndt_slam/PointCloudMap.h:124-136).

2D points are written as XYZ with z = 0, matching the reference's
pcl::PointXYZ clouds built from LPoint2D (src/PointCloudMap.cpp:58-68).
"""

from __future__ import annotations

import numpy as np

_HEADER = """# .PCD v0.7 - Point Cloud Data file format
VERSION 0.7
FIELDS x y z
SIZE 4 4 4
TYPE F F F
COUNT 1 1 1
WIDTH {n}
HEIGHT 1
VIEWPOINT 0 0 0 1 0 0 0
POINTS {n}
DATA ascii
"""


def save_pcd(path: str, xy: np.ndarray):
    # native fast path (csrc/libndtslam.so), identical output format
    from ndt_slam_tpu.io import native
    try:
        if native.save_pcd(path, np.asarray(xy)):
            return
    except OSError:
        pass
    _save_pcd_py(path, xy)


def _save_pcd_py(path: str, xy: np.ndarray):
    xy = np.asarray(xy, dtype=np.float32).reshape(-1, 2)
    with open(path, "w") as f:
        f.write(_HEADER.format(n=xy.shape[0]))
        for x, y in xy:
            f.write(f"{x:.6f} {y:.6f} 0\n")


def load_pcd(path: str) -> np.ndarray:
    pts = []
    with open(path) as f:
        data = False
        for line in f:
            if data:
                v = line.split()
                if len(v) >= 2:
                    pts.append([float(v[0]), float(v[1])])
            elif line.startswith("DATA"):
                data = True
    return np.asarray(pts, dtype=np.float32).reshape(-1, 2)
