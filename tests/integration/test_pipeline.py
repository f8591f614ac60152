"""End-to-end pipeline tests on the simulator (BASELINE.json configs
2-3 shape: scan-to-map NDT odometry with fusion and incremental map).
"""

import numpy as np

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.io.simulate import simulate_sequence, default_world, Mover
from ndt_slam_tpu.pipeline.runner import run_slam
from ndt_slam_tpu.metrics import ate_rmse


def _small_cfg(**kw):
    base = dict(
        grid_cells_x=128, grid_cells_y=128,
        max_scan_points=1024,
        max_submap_points=16384,
        max_local_map_points=32768,
        end_frame=10_000,
    )
    base.update(kw)
    return SlamConfig.small(**base)


def test_short_sequence_beats_odometry():
    frames = simulate_sequence(n_frames=60, beams=361, seed=1,
                               odo_noise_v=0.08, odo_noise_w=2.0)
    cfg = _small_cfg()
    fe = run_slam(frames, cfg)
    n = len(fe.pose_history)
    assert n == 60
    true = np.asarray([f.true_pose for f in frames])
    odo = np.asarray([f.odo_pose for f in frames])
    est = fe.get_poses()
    ate_est = ate_rmse(est, true, align=False)
    ate_odo = ate_rmse(odo, true, align=False)
    # SLAM must beat raw dead-reckoning; without loop closure the
    # residual is scan-to-map random-walk drift (~0.4% of a 28 m path
    # at this noise level; the zero-noise run is exact to <1 mm)
    assert ate_est < 0.15, (ate_est, ate_odo)
    assert ate_est < 0.75 * ate_odo
    # most frames accepted
    acc = np.mean([1.0 if m.get("successful") else 0.0 for m in fe.metrics])
    assert acc > 0.9


def test_sequence_with_moving_object():
    mover = Mover(
        start=np.array([1.0, -3.2]), velocity=np.array([0.05, 0.04]),
        size=0.8, t_on=5, t_off=40,
    )

    def swept_hits(gm):
        hits = 0
        for t in range(5, 40):
            c = mover.start + mover.velocity * t
            inside = np.all(np.abs(gm - c) < 0.45, axis=1)
            hits += int(inside.sum())
        return hits

    results = {}
    for rm in (True, False):
        w = default_world()
        w.movers.append(mover)
        frames = simulate_sequence(n_frames=50, beams=361, seed=2, world=w)
        cfg = _small_cfg(remove_moving=rm)
        fe = run_slam(frames, cfg)
        true = np.asarray([f.true_pose for f in frames])
        assert ate_rmse(fe.get_poses(), true, align=False) < 0.15
        results[rm] = swept_hits(fe.pcmap.global_map())
    # dynamic-object removal must strip most of the mover's trace
    assert results[True] < 0.4 * results[False], results


def test_reject_falls_back_to_odometry():
    # absurd score threshold forces rejection; pipeline must not crash
    # and poses must follow odometry exactly after frame 0
    frames = simulate_sequence(n_frames=10, beams=181, seed=3)
    cfg = _small_cfg(score_thre=-1.0)  # nothing can pass
    fe = run_slam(frames, cfg)
    assert len(fe.pose_history) == 10
    acc = [m.get("successful") for m in fe.metrics[1:]]
    assert not any(acc)
    # dead-reckoned trajectory == odometry-composed trajectory
    odo = np.asarray([f.odo_pose for f in frames])
    est = fe.get_poses()
    # frame 0 bootstraps at odometry; all later frames are pure
    # prediction, so est equals odometry up to float error
    assert np.allclose(est[:, :2], odo[:, :2], atol=1e-3)


def test_zero_noise_is_exact():
    # with exact odometry and noise-free scans the pipeline must track
    # ground truth to sub-millimeter (validates the whole chain end to end)
    frames = simulate_sequence(n_frames=40, beams=361, seed=4,
                               noise_range=0.0, odo_noise_v=0.0,
                               odo_noise_w=0.0)
    cfg = _small_cfg()
    fe = run_slam(frames, cfg)
    true = np.asarray([f.true_pose for f in frames])
    est = fe.get_poses()
    from ndt_slam_tpu.metrics import ate_rmse as _ate
    assert _ate(est, true, align=False) < 2e-3
