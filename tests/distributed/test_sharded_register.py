"""Shard-invariance of the multi-chip registration path (SURVEY.md §4
item 4): the sharded NDT grid build / Newton solve / fitness must agree
with the single-device path on an 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core.points import pad_points
from ndt_slam_tpu.ndt.fitness import fitness_score
from ndt_slam_tpu.ndt.grid import build_grid
from ndt_slam_tpu.ndt.score import gauss_constants
from ndt_slam_tpu.ndt.solve import align
from ndt_slam_tpu.parallel import (
    make_batch_register,
    make_mesh,
    make_sharded_frame_step,
    make_sharded_register,
)


# Tight convergence (trans_eps 1e-4 vs the reference's 0.01): at the
# reference epsilon the Newton loop STOPS once the step is < 1cm, so the
# returned pose is only determined to ~1e-3 and f32 shard-order roundoff
# can legitimately shift the stopping iteration (5 vs 6). Comparing the
# tightly-converged optimum makes shard-invariance well-defined (~1e-6).
CFG = SlamConfig(
    grid_cells_x=64, grid_cells_y=64,
    ndt_min_points_per_cell=3, ndt_max_iterations=80,
    ndt_trans_eps=1e-4,
)


def _room_scan(n, pose=(0.0, 0.0, 0.0), noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    tx, ty, th = pose
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    pts = []
    for a in angles:
        wa = a + th
        dx, dy = np.cos(wa), np.sin(wa)
        ts = []
        if dx > 1e-9: ts.append((5.0 - tx) / dx)
        if dx < -1e-9: ts.append((-5.0 - tx) / dx)
        if dy > 1e-9: ts.append((4.0 - ty) / dy)
        if dy < -1e-9: ts.append((-4.0 - ty) / dy)
        t = min(t for t in ts if t > 0) + noise * rng.standard_normal()
        pts.append([t * np.cos(a), t * np.sin(a)])
    return np.asarray(pts, dtype=np.float32)


def _single_device_reference(src, tgt, init):
    grid = build_grid(
        tgt.xy, tgt.mask, jnp.zeros(2, jnp.float32),
        CFG.grid_cells_x, CFG.grid_cells_y, CFG.ndt_resolution,
        min_pts=CFG.ndt_min_points_per_cell,
    )
    d1, d2 = gauss_constants(CFG.ndt_resolution, CFG.ndt_outlier_ratio)
    return align(
        init, src.xy, src.mask, grid, d1, d2,
        max_iterations=CFG.ndt_max_iterations,
        step_size=CFG.ndt_step_size, trans_eps=CFG.ndt_trans_eps,
        radius=CFG.ndt_neighborhood,
    )


@pytest.fixture(scope="module")
def pair():
    tgt = pad_points(_room_scan(720), 4096)
    src = pad_points(
        _room_scan(360, pose=(0.10, -0.06, 0.05), seed=3), 1024
    )
    init = jnp.zeros(3, dtype=jnp.float32)
    return src, tgt, init


def test_sharded_register_matches_single_device(pair):
    src, tgt, init = pair
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(8, dp=1)
    fn = make_sharded_register(mesh, CFG)
    out = fn(src.xy, src.mask, tgt.xy, tgt.mask, init, jnp.zeros(2, jnp.float32))
    ref = _single_device_reference(src, tgt, init)
    np.testing.assert_allclose(
        np.asarray(out.pose_rad), np.asarray(ref.pose_rad), atol=5e-5
    )
    assert bool(out.converged)
    # true pose recovered
    est = np.asarray(out.pose_rad)
    assert np.hypot(est[0] - 0.10, est[1] + 0.06) < 2e-3
    assert abs(est[2] - 0.05) < 2e-3


def test_sharded_fitness_modes_agree(pair):
    src, tgt, _ = pair
    plain = float(fitness_score(src.xy, src.mask, tgt.xy, tgt.mask))
    mesh = make_mesh(8, dp=1)
    from jax.sharding import PartitionSpec as P

    for mode, specs in [
        ("sources", (P("pt"), P("pt"), P(), P())),
        ("targets", (P(), P(), P("pt"), P("pt"))),
        ("both", (P("pt"), P("pt"), P("pt"), P("pt"))),
    ]:
        fn = jax.jit(
            jax.shard_map(
                lambda a, b, c, d, m=mode: fitness_score(
                    a, b, c, d, axis_name="pt", sharded=m
                ),
                mesh=mesh,
                in_specs=specs,
                out_specs=P(),
            )
        )
        got = float(fn(src.xy, src.mask, tgt.xy, tgt.mask))
        # f32 summation order differs across shard layouts
        np.testing.assert_allclose(got, plain, rtol=1e-5), mode


def test_batch_register_dp_tp():
    """2D mesh (2-way pair batch x 4-way point sharding): every batch
    row must match its single-device registration bit-for-bit-ish —
    shard-invariance, the property the mesh must preserve."""
    tgt = pad_points(_room_scan(720, noise=0.01), 4096)
    mesh = make_mesh(8, dp=2)
    fn = make_batch_register(mesh, CFG)
    # odometry-prediction-scale initial errors (the reference's operating
    # regime, SURVEY.md §3.2: init = motion-model prediction): sharp
    # 1cm-noise cells give plain NDT a ~+-3cm basin; larger cold offsets
    # are the loop-closure path's job (coarse-to-fine, graph/).
    poses = [(0.03, 0.02, -0.03), (-0.02, 0.03, 0.04)]
    srcs = [
        pad_points(_room_scan(360, pose=p, noise=0.01, seed=i), 1024)
        for i, p in enumerate(poses)
    ]
    B = 2
    src_xy = jnp.stack([s.xy for s in srcs])
    src_mask = jnp.stack([s.mask for s in srcs])
    tgt_xy = jnp.broadcast_to(tgt.xy, (B,) + tgt.xy.shape)
    tgt_mask = jnp.broadcast_to(tgt.mask, (B,) + tgt.mask.shape)
    init = jnp.zeros((B, 3), jnp.float32)
    center = jnp.zeros((B, 2), jnp.float32)
    out = fn(src_xy, src_mask, tgt_xy, tgt_mask, init, center)
    est = np.asarray(out.pose_rad)
    for i, p in enumerate(poses):
        ref = _single_device_reference(srcs[i], tgt, init[i])
        assert bool(out.converged[i])
        np.testing.assert_allclose(
            est[i], np.asarray(ref.pose_rad), atol=5e-5
        )
        # with non-degenerate (noisy) cells the pose is also recovered
        assert np.hypot(est[i, 0] - p[0], est[i, 1] - p[1]) < 2e-2, (i, est[i], p)
        assert abs(est[i, 2] - p[2]) < 1e-2


def test_sharded_frame_step_matches_production_step(pair):
    """VERDICT r3 weak #1: the dp x pt frame step must produce the SAME
    numerics as the production single-device step — both now share the
    fuse/ekf.gate_and_fuse accept/fuse tail (covariance cap, innovation
    + fused-pose gates, Hessian repair). Parity on fused pose, cov,
    cost, and the accept decision on identical inputs."""
    from ndt_slam_tpu.mapping.voxel import voxel_filter
    from ndt_slam_tpu.pipeline.frontend import _registration_step

    src, tgt, _ = pair
    # Non-trivial odometry chain: prediction lands near the true pose
    # (0.10, -0.06, 0.05 rad = 2.86 deg), reference operating regime.
    odo = jnp.asarray([0.09, -0.05, 2.6], jnp.float32)
    prev_odo = jnp.zeros(3, jnp.float32)
    last_pose = jnp.zeros(3, jnp.float32)
    last_cov = jnp.eye(3, dtype=jnp.float32) * 1e-4

    ref = _registration_step(
        CFG, src.xy, src.mask, odo, prev_odo, last_pose, last_cov,
        tgt.xy, tgt.mask,
    )

    # The sharded step takes the already-downsampled source (the caller
    # runs the voxel filter replicated first) — feed it the exact same
    # filtered buffer the production step builds internally.
    fsrc = voxel_filter(src, CFG.source_leaf_size)
    mesh = make_mesh(8, dp=2)
    fn = make_sharded_frame_step(mesh, CFG)
    B = 2
    out = fn(
        jnp.broadcast_to(fsrc.xy, (B,) + fsrc.xy.shape),
        jnp.broadcast_to(fsrc.mask, (B,) + fsrc.mask.shape),
        jnp.broadcast_to(tgt.xy, (B,) + tgt.xy.shape),
        jnp.broadcast_to(tgt.mask, (B,) + tgt.mask.shape),
        jnp.broadcast_to(odo, (B, 3)),
        jnp.broadcast_to(prev_odo, (B, 3)),
        jnp.broadcast_to(last_pose, (B, 3)),
        jnp.broadcast_to(last_cov, (B, 3, 3)),
    )

    assert bool(ref.successful), "setup must exercise the accept path"
    for i in range(B):
        assert bool(out.successful[i]) == bool(ref.successful)
        np.testing.assert_allclose(
            np.asarray(out.est_pose[i]), np.asarray(ref.est_pose),
            atol=5e-3,  # deg/m; f32 shard-order roundoff through Newton
        )
        np.testing.assert_allclose(
            np.asarray(out.fused_pose[i]), np.asarray(ref.fused_pose),
            atol=5e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out.cov[i]), np.asarray(ref.cov),
            rtol=5e-3, atol=1e-9,
        )
        np.testing.assert_allclose(
            float(out.cost[i]), float(ref.cost), rtol=1e-3, atol=1e-7,
        )


def test_sharded_frame_step_compiles_and_runs(pair):
    src, tgt, _ = pair
    mesh = make_mesh(8, dp=2)
    fn = make_sharded_frame_step(mesh, CFG)
    B = 2
    src_xy = jnp.broadcast_to(src.xy, (B,) + src.xy.shape)
    src_mask = jnp.broadcast_to(src.mask, (B,) + src.mask.shape)
    tgt_xy = jnp.broadcast_to(tgt.xy, (B,) + tgt.xy.shape)
    tgt_mask = jnp.broadcast_to(tgt.mask, (B,) + tgt.mask.shape)
    odo = jnp.zeros((B, 3), jnp.float32)
    prev = jnp.zeros((B, 3), jnp.float32)
    last = jnp.zeros((B, 3), jnp.float32)
    last_cov = jnp.broadcast_to(
        jnp.eye(3, dtype=jnp.float32) * 1e-4, (B, 3, 3)
    )
    out = fn(src_xy, src_mask, tgt_xy, tgt_mask, odo, prev, last, last_cov)
    assert np.all(np.isfinite(np.asarray(out.fused_pose)))
    assert np.all(np.isfinite(np.asarray(out.cov)))
    # the two identical batch rows must agree exactly (SPMD determinism)
    np.testing.assert_array_equal(
        np.asarray(out.fused_pose[0]), np.asarray(out.fused_pose[1])
    )
