"""Real-data-format acceptance: SLAM over the committed CARMEN fixture.

The BASELINE.json acceptance metric is ATE on CARMEN logs vs the
reference pipeline's bound (BASELINE.md). The environment is offline,
so the committed office_loop fixture (cli/make_carmen_fixture.py) is
the stand-in: same format, same sensor model, exact ground truth. The
full 500-frame numbers are recorded in BASELINE.md; this test runs a
prefix with the small config so CI stays fast, asserting the SLAM
estimate beats raw odometry and lands within a tight absolute bound.
"""

import os

import numpy as np

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.io.carmen import read_carmen_gt, read_carmen_log
from ndt_slam_tpu.metrics import ate_rmse
from ndt_slam_tpu.pipeline.runner import run_slam

DATA = os.path.join(os.path.dirname(__file__), "..", "data")

N = 80


def test_carmen_fixture_slam_beats_odometry(tmp_path):
    frames = read_carmen_log(
        os.path.join(DATA, "office_loop.clf"), max_frames=N
    )
    gt = read_carmen_gt(os.path.join(DATA, "office_loop.gt"))[:N]

    cfg = SlamConfig.small(end_frame=N)
    fe = run_slam(frames, cfg, out_dir=str(tmp_path))
    est = fe.get_poses()
    assert est.shape == (N, 3)

    ate_slam = ate_rmse(est, gt)
    odo = np.stack([f.odo_pose for f in frames])
    ate_odo = ate_rmse(odo, gt)

    accept = np.mean([1.0 if m.get("successful") else 0.0
                      for m in fe.metrics])
    assert accept >= 0.9, accept
    assert ate_slam < ate_odo, (ate_slam, ate_odo)
    assert ate_slam < 0.10, ate_slam

    # outputs written in reference format
    assert (tmp_path / "poses.txt").exists()
    assert (tmp_path / "map.pcd").exists()
