"""Loop-closure backend end-to-end (BASELINE.json config 4 shape):
a drifting loop trajectory must snap back when the loop closes."""

import numpy as np

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.graph.loop_closure import verify_candidates
from ndt_slam_tpu.core.points import pad_points
from ndt_slam_tpu.io.simulate import simulate_sequence
from ndt_slam_tpu.metrics import ate_rmse
from ndt_slam_tpu.pipeline.runner import run_slam


def _loop_cfg(**kw):
    base = dict(
        grid_cells_x=128, grid_cells_y=128,
        max_scan_points=1024,
        max_submap_points=16384,
        max_local_map_points=32768,
        end_frame=10_000,
        loop_enable=True,
        loop_min_frame_gap=30,
        loop_radius=3.0,
        loop_score_thre=0.02,
        loop_keyframe_skip=3,
        loop_check_skip=3,
        pgo_iterations=10,
    )
    base.update(kw)
    return SlamConfig.small(**base)


def _circle(n, radius=4.0):
    s = np.linspace(0, 2 * np.pi, n)
    x = radius * np.sin(s)
    y = radius * (1 - np.cos(s))
    th = np.degrees(s + np.pi / 2)  # heading tangent... (d/ds)
    th = np.degrees(np.arctan2(np.gradient(y), np.gradient(x)))
    return np.stack([x, y, th], axis=1)


def test_loop_verifier_recovers_large_offset():
    """Coarse-to-fine must recover a ~0.5 m / 5 deg initial error that
    plain NDT (basin ~1 cell) cannot."""
    import jax.numpy as jnp

    frames = simulate_sequence(n_frames=2, beams=541, seed=3,
                               noise_range=0.01)
    f = frames[0]
    tgt = pad_points(f.scan_xy, 1024)
    src = pad_points(f.scan_xy, 1024)  # same scan; true rel pose = 0
    cfg = _loop_cfg()
    B = cfg.loop_max_candidates
    init = np.zeros((B, 3), np.float32)
    init[0] = [0.5, -0.4, np.deg2rad(5.0)]
    out = verify_candidates(
        cfg, src.xy, src.mask,
        jnp.broadcast_to(tgt.xy, (B,) + tgt.xy.shape),
        jnp.broadcast_to(tgt.mask, (B,) + tgt.mask.shape),
        jnp.asarray(init),
    )
    rel = np.asarray(out.rel_pose_rad[0])
    assert bool(out.accepted[0]), (rel, float(out.cost[0]))
    assert np.abs(rel[:2]).max() < 0.02, rel
    assert abs(rel[2]) < 0.01, rel


def test_loop_closure_reduces_drift():
    traj = _circle(90)
    frames = simulate_sequence(
        n_frames=90, beams=361, seed=7, trajectory=traj,
        odo_noise_v=0.10, odo_noise_w=2.5,
    )
    true = np.asarray([f.true_pose for f in frames])

    cfg_off = _loop_cfg(loop_enable=False)
    fe_off = run_slam(frames, cfg_off)
    ate_off = ate_rmse(fe_off.get_poses(), true, align=False)

    cfg_on = _loop_cfg()
    fe_on = run_slam(frames, cfg_on)
    ate_on = ate_rmse(fe_on.get_poses(), true, align=False)

    assert fe_on.backend is not None
    assert fe_on.backend.loops_accepted >= 1, "no loop closed"
    # closing the loop must not hurt, and should measurably help the
    # second half of the trajectory (where drift has accumulated)
    assert ate_on <= ate_off * 1.05, (ate_on, ate_off)
    tail_on = ate_rmse(fe_on.get_poses()[60:], true[60:], align=False)
    tail_off = ate_rmse(fe_off.get_poses()[60:], true[60:], align=False)
    assert tail_on < tail_off, (tail_on, tail_off)
