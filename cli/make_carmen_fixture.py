#!/usr/bin/env python
"""Generate the committed CARMEN-format benchmark fixture.

The environment is fully offline (the real Intel/ACES/MIT-Killian logs
cannot be downloaded), so the real-data acceptance path runs on a
committed CARMEN-format log of a simulated office loop instead: same
file format, same sensor model (180 beams over pi, 81.9 m no-echo
sentinel), same failure modes (drifting odometry, loop revisit), plus
the one thing the real logs lack — exact ground truth.

Outputs (deterministic, seed pinned):
  tests/data/office_loop.clf  — FLASER lines (CARMEN log format)
  tests/data/office_loop.gt   — ground-truth "tx ty theta_deg" per frame

World: a 26 x 20 m office ring (outer walls + inner block) with
doorway gaps, alcoves, and pillars; the robot drives ~1.4 laps of the
corridor at 0.2 m/frame, so the tail revisits the start (loop-closure
material). Odometry = integrated noisy relative motion with a small
systematic heading bias — the classic dead-reckoning drift model.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from ndt_slam_tpu.core.angles import wrap_deg  # noqa: E402
from ndt_slam_tpu.io.simulate import raycast  # noqa: E402

NO_ECHO = 81.90  # classic SICK out-of-range sentinel


def _rect(x0, y0, x1, y1):
    return [
        [x0, y0, x1, y0], [x1, y0, x1, y1],
        [x1, y1, x0, y1], [x0, y1, x0, y0],
    ]


def _wall(x0, y0, x1, y1):
    return [[x0, y0, x1, y1]]


def office_world() -> np.ndarray:
    """Segment soup [M,4] of the office ring."""
    segs = []
    segs += _rect(0.0, 0.0, 26.0, 20.0)          # outer walls
    # inner block with two doorway gaps (south wall split, west wall split)
    segs += _wall(5.0, 5.0, 11.0, 5.0)           # south, gap 11..12.5
    segs += _wall(12.5, 5.0, 21.0, 5.0)
    segs += _wall(21.0, 5.0, 21.0, 15.0)         # east
    segs += _wall(21.0, 15.0, 5.0, 15.0)         # north
    segs += _wall(5.0, 15.0, 5.0, 11.0)          # west, gap 11..9.5
    segs += _wall(5.0, 9.5, 5.0, 5.0)
    # interior texture visible through the doorways
    segs += _rect(9.0, 8.0, 10.0, 9.0)
    segs += _rect(15.0, 10.5, 16.5, 11.5)
    # alcoves in the outer wall (break corridor symmetry)
    segs += _wall(7.0, 0.0, 7.0, 1.0)
    segs += _wall(7.0, 1.0, 9.0, 1.0)
    segs += _wall(9.0, 1.0, 9.0, 0.0)
    segs += _wall(26.0, 8.0, 25.0, 8.0)
    segs += _wall(25.0, 8.0, 25.0, 12.0)
    segs += _wall(25.0, 12.0, 26.0, 12.0)
    segs += _wall(14.0, 20.0, 14.0, 18.8)
    segs += _wall(0.0, 6.0, 1.2, 6.0)
    # pillars in the corridor corners
    segs += _rect(2.3, 17.0, 2.9, 17.6)
    segs += _rect(23.0, 2.4, 23.6, 3.0)
    segs += _rect(12.2, 2.0, 12.8, 2.6)
    return np.asarray(segs, dtype=np.float64)


def loop_trajectory(n: int, step: float = 0.2) -> np.ndarray:
    """Rounded-rectangle centerline of the corridor, heading along the
    tangent. Returns [n,3] (tx, ty, theta_deg); wraps past one lap."""
    x0, y0, x1, y1, r = 2.5, 2.5, 23.5, 17.5, 1.5
    # piecewise: 4 straights + 4 quarter arcs, counter-clockwise from
    # (x0+r, y0) heading +x.
    Lx = (x1 - x0) - 2 * r
    Ly = (y1 - y0) - 2 * r
    qa = 0.5 * np.pi * r
    lens = [Lx, qa, Ly, qa, Lx, qa, Ly, qa]
    total = sum(lens)

    def at(s):
        s = s % total
        # segment walk
        if s < Lx:                                   # bottom straight ->
            return (x0 + r + s, y0, 0.0)
        s -= Lx
        if s < qa:                                   # corner at (x1-r, y0+r)
            a = s / r
            cx, cy = x1 - r, y0 + r
            return (cx + r * np.sin(a), cy - r * np.cos(a), np.degrees(a))
        s -= qa
        if s < Ly:                                   # right straight ^
            return (x1, y0 + r + s, 90.0)
        s -= Ly
        if s < qa:
            a = s / r
            cx, cy = x1 - r, y1 - r
            return (cx + r * np.cos(a), cy + r * np.sin(a),
                    90.0 + np.degrees(a))
        s -= qa
        if s < Lx:                                   # top straight <-
            return (x1 - r - s, y1, 180.0)
        s -= Lx
        if s < qa:
            a = s / r
            cx, cy = x0 + r, y1 - r
            return (cx - r * np.sin(a), cy + r * np.cos(a),
                    180.0 + np.degrees(a))
        s -= qa
        if s < Ly:                                   # left straight v
            return (x0, y1 - r - s, 270.0)
        s -= Ly
        a = s / r                                    # corner back to start
        cx, cy = x0 + r, y0 + r
        return (cx - r * np.cos(a), cy - r * np.sin(a), 270.0 + np.degrees(a))

    out = np.array([at(i * step) for i in range(n)], dtype=np.float64)
    out[:, 2] = [wrap_deg(v) for v in out[:, 2]]
    return out


def generate(
    n_frames: int = 500,
    beams: int = 180,
    seed: int = 7,
    noise_range: float = 0.01,
    odo_noise_v: float = 0.04,
    odo_noise_w: float = 1.2,
    odo_bias_w_deg: float = 0.02,   # systematic heading drift per frame
    max_range: float = 30.0,
    dt: float = 0.5,
):
    rng = np.random.default_rng(seed)
    segs = office_world()
    traj = loop_trajectory(n_frames)
    fov = np.pi
    rel_angles = -fov / 2.0 + fov * np.arange(beams) / (beams - 1)

    gt = traj.copy()
    odo = traj[0].copy()
    lines = []
    gt_lines = []
    for i in range(n_frames):
        tp = traj[i]
        th_rad = np.radians(tp[2])
        r = raycast(segs, tp[:2], rel_angles + th_rad, max_range)
        r = r + noise_range * rng.standard_normal(beams)
        r = np.where(np.isfinite(r) & (r < max_range), r, NO_ECHO)

        if i > 0:
            p_prev, p_cur = traj[i - 1], traj[i]
            c, s = (np.cos(np.radians(p_prev[2])),
                    np.sin(np.radians(p_prev[2])))
            dxw, dyw = p_cur[0] - p_prev[0], p_cur[1] - p_prev[1]
            mx = c * dxw + s * dyw
            my = -s * dxw + c * dyw
            mth = float(wrap_deg(p_cur[2] - p_prev[2]))
            d = float(np.hypot(mx, my))
            mx += rng.standard_normal() * (odo_noise_v * d + 1e-4)
            my += rng.standard_normal() * (odo_noise_v * d + 1e-4)
            mth += (rng.standard_normal()
                    * (odo_noise_w * abs(mth) / 57.3 + 0.03)
                    + odo_bias_w_deg)
            co, so = np.cos(np.radians(odo[2])), np.sin(np.radians(odo[2]))
            odo = np.array([
                odo[0] + co * mx - so * my,
                odo[1] + so * mx + co * my,
                float(wrap_deg(odo[2] + mth)),
            ])

        ts = i * dt
        rs = " ".join(f"{v:.3f}" for v in r)
        ox, oy, oth = odo[0], odo[1], np.radians(odo[2])
        lines.append(
            f"FLASER {beams} {rs} "
            f"{ox:.6f} {oy:.6f} {oth:.6f} {ox:.6f} {oy:.6f} {oth:.6f} "
            f"{ts:.6f} simhost {ts:.6f}"
        )
        gt_lines.append(f"{gt[i, 0]:.6f} {gt[i, 1]:.6f} {gt[i, 2]:.6f}")
    return lines, gt_lines


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "data"))
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--name", default="office_loop")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    lines, gt_lines = generate(n_frames=args.frames)
    clf = os.path.join(args.out_dir, args.name + ".clf")
    gt = os.path.join(args.out_dir, args.name + ".gt")
    with open(clf, "w") as f:
        f.write("# CARMEN-format fixture (see cli/make_carmen_fixture.py)\n")
        f.write("\n".join(lines) + "\n")
    with open(gt, "w") as f:
        f.write("\n".join(gt_lines) + "\n")
    print(f"wrote {clf} ({len(lines)} frames) and {gt}")


if __name__ == "__main__":
    main()
