"""CARMEN log reader (Intel Research Lab / ACES / MIT-Killian format).

The standard 2D SLAM benchmark logs named by BASELINE.json. Two laser
message flavors are supported:

  FLASER num_readings r_1 ... r_n x y theta odom_x odom_y odom_theta
         ts host log_ts
  ROBOTLASER1 laser_type start_angle fov angular_res max_range accuracy
         remission_mode num_readings r_1 ... r_n num_remissions [...]
         x y theta odom_x odom_y odom_theta tv rv fwd_safety side_safety
         turn_axis ts host log_ts

One frame is emitted per laser line: ranges -> sensor-frame points.
FLASER carries no geometry header, so the classic-log convention is
assumed: `num_readings` beams spanning `fov_rad` (default pi), beam 0
at -fov/2 relative to the robot heading, spacing fov/(n-1).
ROBOTLASER1 declares start_angle/fov/angular_res explicitly and those
are used as written.

The pose attached to each frame is the LASER pose (x y theta) — the
same frame the ranges are measured in; the trailing odom_* fields are
the robot-center odometry, which differs by the (unknown to us) sensor
mount offset. Angles convert to degrees at this boundary (the
pipeline's reference-parity unit, SURVEY.md §6.3 item 1).

Out-of-range convention: classic SICK logs write ~81.9 m for no-echo;
anything >= `max_range` (or < 0.05 m) is dropped by mask.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ndt_slam_tpu.io.tsukuba import LogFrame


def _points_from_ranges(
    r: np.ndarray, angles: np.ndarray, max_range: float
) -> np.ndarray:
    ok = (r > 0.05) & (r < max_range)
    return np.stack(
        [r[ok] * np.cos(angles[ok]), r[ok] * np.sin(angles[ok])],
        axis=1,
    ).astype(np.float32)


def read_carmen_log(
    path: str,
    max_range: float = 50.0,
    fov_rad: float = np.pi,
    max_frames: Optional[int] = None,
) -> List[LogFrame]:
    """Parse FLASER / ROBOTLASER1 lines into LogFrames (one per scan)."""
    frames: List[LogFrame] = []
    sid = 0
    with open(path, "r") as f:
        for line in f:
            if max_frames is not None and sid >= max_frames:
                break
            if line.startswith("FLASER"):
                tok = line.split()
                n = int(tok[1])
                if len(tok) < 2 + n + 6:
                    continue  # truncated line
                r = np.asarray(tok[2:2 + n], dtype=np.float64)
                x, y, th = (float(v) for v in tok[2 + n:5 + n])
                angles = (
                    -fov_rad / 2.0 + fov_rad * np.arange(n) / max(n - 1, 1)
                )
                cutoff = max_range
            elif line.startswith("ROBOTLASER1"):
                tok = line.split()
                # header: type start_angle fov angular_res max_range
                #         accuracy remission_mode
                start_angle = float(tok[2])
                ang_res = float(tok[4])
                sensor_max = float(tok[5])
                n = int(tok[8])
                if len(tok) < 9 + n + 1:
                    continue
                r = np.asarray(tok[9:9 + n], dtype=np.float64)
                n_rem = int(tok[9 + n])
                base = 10 + n + n_rem
                if len(tok) < base + 6:
                    continue
                x, y, th = (float(v) for v in tok[base:base + 3])
                angles = start_angle + ang_res * np.arange(n)
                cutoff = min(max_range, sensor_max - 1e-3)
            else:
                continue
            pts = _points_from_ranges(r, angles, cutoff)
            frames.append(LogFrame(
                stamp=sid,
                odo_pose=np.array(
                    [x, y, np.degrees(th)], dtype=np.float32
                ),
                scan_xy=pts,
            ))
            sid += 1
    return frames


def read_carmen_gt(path: str) -> np.ndarray:
    """Ground-truth trajectory companion file: one "tx ty theta_deg"
    per laser frame (the io/traj.py poses_full format)."""
    poses = np.loadtxt(path, dtype=np.float64)
    if poses.ndim == 1:
        poses = poses[None, :]
    assert poses.shape[1] == 3, poses.shape
    return poses
