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
    # closing the loop must STRICTLY improve full-trajectory ATE (a
    # regressing PGO must fail here, VERDICT r1 weak #5), and must
    # measurably help the second half (where drift has accumulated)
    assert ate_on < ate_off, (ate_on, ate_off)
    tail_on = ate_rmse(fe_on.get_poses()[60:], true[60:], align=False)
    tail_off = ate_rmse(fe_off.get_poses()[60:], true[60:], align=False)
    assert tail_on < tail_off, (tail_on, tail_off)


def test_loop_closure_async_verify_matches_sync():
    """Async verification (cfg.loop_verify_async=1, the TPU default:
    a dispatched candidate batch resolves at the NEXT backend check)
    must still close the loops and land within a hair of the sync
    mode's ATE — the one-check-cycle edge delay is absorbed by the
    optimizer."""
    traj = _circle(90)
    frames = simulate_sequence(
        n_frames=90, beams=361, seed=7, trajectory=traj,
        odo_noise_v=0.10, odo_noise_w=2.5,
    )
    true = np.asarray([f.true_pose for f in frames])

    fe_sync = run_slam(frames, _loop_cfg(loop_verify_async=0))
    fe_async = run_slam(frames, _loop_cfg(loop_verify_async=1))
    assert fe_async.backend.loops_accepted >= 1
    ate_sync = ate_rmse(fe_sync.get_poses(), true, align=False)
    ate_async = ate_rmse(fe_async.get_poses(), true, align=False)
    # both closed; async may differ slightly (edges land a check later)
    assert ate_async < 1.5 * ate_sync + 0.05, (ate_async, ate_sync)
    # the backend wall-time split is being recorded
    assert fe_async.backend.t_verify >= 0.0
    assert fe_async.backend.t_optimize > 0.0


def test_async_verify_survives_keyframe_decimation():
    """Regression (code-review r4): the async verify in-flight record
    captured store INDICES; a KeyframeStore decimation between dispatch
    and resolve then crashed (IndexError) or silently attached an edge
    to the wrong node. Candidate SIDs are captured at dispatch now. A
    tiny keyframe cap with per-frame stores forces several decimations
    while verifications are in flight."""
    traj = _circle(90)
    frames = simulate_sequence(
        n_frames=90, beams=361, seed=7, trajectory=traj,
        odo_noise_v=0.10, odo_noise_w=2.5,
    )
    true = np.asarray([f.true_pose for f in frames])
    cfg = _loop_cfg(loop_verify_async=1, max_keyframes=16,
                    loop_keyframe_skip=1, loop_check_skip=2)
    fe = run_slam(frames, cfg)
    assert len(fe.backend.keyframes) <= 16  # decimation really fired
    assert fe.backend.loops_accepted >= 1
    node_sids = set(fe.backend.node_sids)
    for e in fe.backend.edge_log:
        assert e["sid_old"] in node_sids, e
        assert e["sid_new"] in node_sids, e
    ate = ate_rmse(fe.get_poses(), true, align=False)
    odo = ate_rmse(np.asarray([f.odo_pose for f in frames]), true,
                   align=False)
    assert ate < odo, (ate, odo)


def _wall_scan(segs, n=541, noise=0.005, seed=0):
    """Raycast a scan of line-segment walls from the origin."""
    rng = np.random.default_rng(seed)
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    pts = []
    for a in angles:
        d = np.array([np.cos(a), np.sin(a)])
        best = np.inf
        for (p0, p1) in segs:
            p0 = np.asarray(p0, float); p1 = np.asarray(p1, float)
            e = p1 - p0
            denom = d[0] * (-e[1]) - d[1] * (-e[0])
            if abs(denom) < 1e-12:
                continue
            t = (p0[0] * (-e[1]) - p0[1] * (-e[0])) / denom
            u = (d[0] * p0[1] - d[1] * p0[0]) / denom
            if t > 0 and 0.0 <= u <= 1.0:
                best = min(best, t)
        if np.isfinite(best):
            r = best + noise * rng.standard_normal()
            pts.append([r * np.cos(a), r * np.sin(a)])
    return np.asarray(pts, np.float32)


def test_loop_verifier_rejects_mismatched_place():
    """False-positive gate (VERDICT r1 weak #5): a candidate from a
    DIFFERENT place with similar but not identical geometry (a smaller
    room, different interior) must be rejected by the overlap/cost
    gates even though coarse NDT finds some optimum. The symmetric
    (target-side) overlap gate is what catches structure present in
    the keyframe but absent from the current scan."""
    import jax.numpy as jnp

    def room(w, h, extra=()):
        segs = [((-w, -h), (w, -h)), ((w, -h), (w, h)),
                ((w, h), (-w, h)), ((-w, h), (-w, -h))]
        return segs + list(extra)

    # place A: 5x4 room with a pillar wall near the east side
    src_pts = _wall_scan(room(5, 4, [((2.0, -1.0), (2.0, 1.5))]), seed=1)
    # place B: similar-looking but smaller room, different interior
    tgt_pts = _wall_scan(room(4.2, 3.3, [((-2.5, 0.5), (-0.5, 0.5))]),
                         seed=2)
    src = pad_points(src_pts, 1024)
    tgt = pad_points(tgt_pts, 1024)
    cfg = _loop_cfg()
    B = cfg.loop_max_candidates
    init = np.zeros((B, 3), np.float32)
    out = verify_candidates(
        cfg, src.xy, src.mask,
        jnp.broadcast_to(tgt.xy, (B,) + tgt.xy.shape),
        jnp.broadcast_to(tgt.mask, (B,) + tgt.mask.shape),
        jnp.asarray(init),
    )
    assert not bool(np.asarray(out.accepted).any()), (
        np.asarray(out.cost), np.asarray(out.overlap),
        np.asarray(out.overlap_tgt),
    )


def test_loop_verifier_reports_both_overlap_directions():
    """The symmetric gate's two overlap fractions must both be high for
    a true revisit (same place, large init error) — the quantity the
    accept decision combines."""
    import jax.numpy as jnp

    frames = simulate_sequence(n_frames=2, beams=541, seed=3,
                               noise_range=0.01)
    f = frames[0]
    tgt = pad_points(f.scan_xy, 1024)
    src = pad_points(f.scan_xy, 1024)
    cfg = _loop_cfg()
    B = cfg.loop_max_candidates
    init = np.zeros((B, 3), np.float32)
    init[0] = [0.4, -0.3, np.deg2rad(4.0)]
    out = verify_candidates(
        cfg, src.xy, src.mask,
        jnp.broadcast_to(tgt.xy, (B,) + tgt.xy.shape),
        jnp.broadcast_to(tgt.mask, (B,) + tgt.mask.shape),
        jnp.asarray(init),
    )
    assert bool(out.accepted[0])
    assert float(out.overlap[0]) > 0.9
    assert float(out.overlap_tgt[0]) > 0.9


def test_drift_aware_radius_closes_far_loop():
    """A revisit whose accumulated drift exceeds the static
    loop_radius must still be attempted and closed: the drift-aware
    gate (cfg.loop_drift_gain) widens the candidate radius with the
    accumulated chain covariance. With the gain disabled the loop is
    never even attempted (VERDICT r2 weak #7)."""
    traj = _circle(90)
    frames = simulate_sequence(
        n_frames=90, beams=361, seed=11, trajectory=traj,
        odo_noise_v=0.35, odo_noise_w=7.0,
    )
    true = np.asarray([f.true_pose for f in frames])

    # static radius much smaller than the drift at the revisit
    kw = dict(loop_radius=0.15, loop_min_frame_gap=40)
    fe_static = run_slam(frames, _loop_cfg(loop_drift_gain=0.0, **kw))
    fe_aware = run_slam(frames, _loop_cfg(loop_drift_gain=3.0, **kw))

    # sanity: this sequence really drifts past the static radius
    err_tail = np.hypot(
        *(fe_static.get_poses()[-15:, :2] - true[-15:, :2]).T
    )
    assert err_tail.max() > 0.15, err_tail.max()

    assert fe_static.backend.loops_accepted == 0, (
        "static radius unexpectedly found the loop; test needs more drift"
    )
    assert fe_aware.backend.loops_accepted >= 1, "drift-aware gate failed"

    # the correction anchored at the revisit must improve the revisit
    # region (the early-trajectory drift predates any loop edge, so the
    # whole-run ATE is owned by test_loop_closure_reduces_drift)
    tail_a = ate_rmse(fe_aware.get_poses()[60:], true[60:], align=False)
    tail_s = ate_rmse(fe_static.get_poses()[60:], true[60:], align=False)
    assert tail_a < tail_s, (tail_a, tail_s)
    ate_aware = ate_rmse(fe_aware.get_poses(), true, align=False)
    ate_static = ate_rmse(fe_static.get_poses(), true, align=False)
    assert ate_aware <= ate_static * 1.05, (ate_aware, ate_static)


def test_coarse_multistart_recovers_half_cell_offsets():
    """Initial errors near half a COARSE cell (0.6 m at the 1.2 m
    coarse resolution) land in quantization local minima that a single
    start cannot leave (observed: verification kept its full initial
    error while passing the cost gate). The coarse multi-start
    (cfg.loop_coarse_starts) must recover them; with it disabled the
    stall is reproducible."""
    import jax.numpy as jnp

    frames = simulate_sequence(n_frames=2, beams=541, seed=3,
                               noise_range=0.01)
    f = frames[0]
    tgt = pad_points(f.scan_xy, 1024)
    src = pad_points(f.scan_xy, 1024)  # true rel pose = 0
    B = 4
    init = np.array([
        [0.62, 0.0, 0.0], [0.0, -0.66, 0.05],
        [0.58, 0.63, -0.04], [-0.61, 0.7, 0.02],
    ], np.float32)

    cfg_on = _loop_cfg()
    out = verify_candidates(
        cfg_on, src.xy, src.mask,
        jnp.broadcast_to(tgt.xy, (B,) + tgt.xy.shape),
        jnp.broadcast_to(tgt.mask, (B,) + tgt.mask.shape),
        jnp.asarray(init),
    )
    acc = np.asarray(out.accepted)
    rel = np.asarray(out.rel_pose_rad)
    assert acc.all(), (acc, rel)
    assert np.abs(rel[:, :2]).max() < 0.05, rel

    cfg_off = _loop_cfg(loop_coarse_starts=1)
    out0 = verify_candidates(
        cfg_off, src.xy, src.mask,
        jnp.broadcast_to(tgt.xy, (B,) + tgt.xy.shape),
        jnp.broadcast_to(tgt.mask, (B,) + tgt.mask.shape),
        jnp.asarray(init),
    )
    # single-start must do no better (the stall this feature fixes)
    assert np.asarray(out0.accepted).sum() <= acc.sum()
