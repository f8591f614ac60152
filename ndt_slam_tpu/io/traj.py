"""Trajectory writers.

`save_poses_reference_format` reproduces the reference's pose file
exactly: first line = total pose count, then every 10th pose as
"tx ty th " (reference: SlamLauncher::output_file_poses,
src/SlamLauncher.cpp:30-35 — note the count is of ALL poses while only
every 10th is listed; preserved verbatim for parity).

`save_poses_full` writes every pose (one per line) for ATE tooling.
"""

from __future__ import annotations

import numpy as np


def save_poses_reference_format(path: str, poses: np.ndarray):
    poses = np.asarray(poses).reshape(-1, 3)
    with open(path, "w") as f:
        f.write(f"{len(poses)}\n")
        for i in range(0, len(poses), 10):
            p = poses[i]
            f.write(f"{p[0]} {p[1]} {p[2]} \n")


def save_poses_full(path: str, poses: np.ndarray):
    poses = np.asarray(poses).reshape(-1, 3)
    with open(path, "w") as f:
        for p in poses:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
