"""CARMEN log reader (Intel Research Lab / ACES / MIT-Killian format).

The standard 2D SLAM benchmark logs named by BASELINE.json. Lines:

  FLASER num_readings r_1 ... r_n x y theta odom_x odom_y odom_theta ts host log_ts
  ODOM x y theta tv rv accel ts host log_ts

We emit one frame per FLASER line: ranges -> sensor-frame points
(uniform FOV, CARMEN convention: num_readings beams over pi radians
for the classic logs, beam 0 at -pi/2 relative to the robot), with the
line's own odometry as the odo pose. Angles converted to degrees at
this boundary (the pipeline's reference-parity unit).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ndt_slam_tpu.io.tsukuba import LogFrame


def read_carmen_log(
    path: str,
    max_range: float = 40.0,
    fov_rad: float = np.pi,
) -> List[LogFrame]:
    frames: List[LogFrame] = []
    sid = 0
    with open(path, "r") as f:
        for line in f:
            if not line.startswith("FLASER"):
                continue
            tok = line.split()
            n = int(tok[1])
            if len(tok) < 2 + n + 6:
                continue
            r = np.asarray([float(v) for v in tok[2:2 + n]], dtype=np.float64)
            x, y, th = (float(v) for v in tok[2 + n:5 + n])
            angles = -fov_rad / 2.0 + fov_rad * np.arange(n) / max(n - 1, 1)
            ok = (r > 0.05) & (r < max_range)
            pts = np.stack(
                [r[ok] * np.cos(angles[ok]), r[ok] * np.sin(angles[ok])],
                axis=1,
            ).astype(np.float32)
            frames.append(LogFrame(
                stamp=sid,
                odo_pose=np.array(
                    [x, y, np.degrees(th)], dtype=np.float32
                ),
                scan_xy=pts,
            ))
            sid += 1
    return frames
