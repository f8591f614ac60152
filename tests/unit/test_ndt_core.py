"""NDT grid / score / solver tests.

The autodiff oracle (jax.grad / jax.hessian of the score) validates the
hand-derived fused derivatives — a check the C++ reference never had
(SURVEY.md §4 item 1). The golden single-pair test is BASELINE.json
config 1: recover a known relative pose to <= 1e-3 m / rad.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndt_slam_tpu.core.points import pad_points
from ndt_slam_tpu.ndt import (
    build_grid, gauss_constants,
    ndt_negative_score, ndt_score_grad_hess, align, fitness_score,
)


def _room_scan(n=360, pose=(0.0, 0.0, 0.0), seed=0, noise=0.0):
    """Simulated 360-beam scan of a 10x8 rectangular room, in the sensor
    frame of `pose` (world-frame sensor at pose, returns local points)."""
    rng = np.random.default_rng(seed)
    tx, ty, th = pose
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    pts = []
    for a in angles:
        wa = a + th
        dx, dy = np.cos(wa), np.sin(wa)
        # walls at x=+-5, y=+-4
        ts = []
        if dx > 1e-9: ts.append((5.0 - tx) / dx)
        if dx < -1e-9: ts.append((-5.0 - tx) / dx)
        if dy > 1e-9: ts.append((4.0 - ty) / dy)
        if dy < -1e-9: ts.append((-4.0 - ty) / dy)
        t = min(t for t in ts if t > 0)
        t += noise * rng.standard_normal()
        pts.append([t * np.cos(a), t * np.sin(a)])
    return np.asarray(pts, dtype=np.float32)


RES = 0.3
D1, D2 = gauss_constants(RES)


def _make_grid(world_pts, center=(0.0, 0.0), nx=96, ny=96, min_pts=3):
    buf = pad_points(world_pts, 4096)
    return build_grid(
        buf.xy, buf.mask, jnp.array(center, dtype=jnp.float32),
        nx, ny, RES, min_pts=min_pts,
    )


def test_grid_stats_match_numpy():
    rng = np.random.default_rng(1)
    # one dense cluster fully inside a cell
    base = np.array([3.10, 2.53])
    pts = base + rng.standard_normal((50, 2)) * 0.04
    grid = _make_grid(pts.astype(np.float32), min_pts=6)
    valid = np.asarray(grid.valid)
    assert valid.sum() >= 1
    # find the cell containing base
    ox, oy = np.asarray(grid.origin)
    cx = int(np.floor((base[0] - ox) / RES))
    cy = int(np.floor((base[1] - oy) / RES))
    cid = cx * grid.ny + cy
    assert valid[cid]
    inside = (
        (np.floor((pts[:, 0] - ox) / RES) == cx)
        & (np.floor((pts[:, 1] - oy) / RES) == cy)
    )
    sel = pts[inside]
    mu_np = sel.mean(axis=0)
    cov_np = np.cov(sel.T, ddof=1)
    assert np.allclose(np.asarray(grid.mean[cid]), mu_np, atol=1e-4)
    # compare inverse covariance (inflation shouldn't trigger here)
    inv_np = np.linalg.inv(cov_np)
    assert np.allclose(np.asarray(grid.inv_cov[cid]), inv_np, rtol=2e-2)


def test_grid_eigenvalue_inflation():
    # perfectly collinear points -> singular covariance -> inflated
    x = np.linspace(0.0, 0.25, 30)
    pts = np.stack([0.05 + x * 0.0 + x, np.full_like(x, 0.1)], axis=1)
    grid = _make_grid(pts.astype(np.float32), min_pts=6)
    valid = np.asarray(grid.valid)
    assert valid.sum() >= 1
    for cid in np.nonzero(valid)[0]:
        ic = np.asarray(grid.inv_cov[cid])
        evals = np.linalg.eigvalsh(ic)
        assert np.all(np.isfinite(evals))
        assert evals[0] > 0  # positive definite after inflation
        # lambda ratio of covariance == 100 -> inv ratio == 100
        assert evals[1] / evals[0] < 101.0


def test_score_grad_hess_vs_autodiff():
    world = _room_scan(n=1440, noise=0.01)
    grid = _make_grid(world, min_pts=3)
    src = pad_points(_room_scan(n=180, pose=(0.2, -0.1, 0.1), seed=3), 256)

    pose = jnp.array([0.15, -0.05, 0.08], dtype=jnp.float32)

    E, g, H, matched = ndt_score_grad_hess(
        pose, src.xy, src.mask, grid, D1, D2, radius=1
    )
    assert float(matched) > 10

    f = lambda p: ndt_negative_score(p, src.xy, src.mask, grid, D1, D2, 1)
    E_ref = f(pose)
    g_ref = jax.grad(f)(pose)
    H_ref = jax.hessian(f)(pose)

    assert np.allclose(float(E), float(E_ref), rtol=1e-5)
    assert np.allclose(np.asarray(g), np.asarray(g_ref), rtol=2e-3, atol=1e-4)
    assert np.allclose(np.asarray(H), np.asarray(H_ref), rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize(
    "true_pose",
    [(0.10, -0.06, np.deg2rad(3.0)), (-0.08, 0.12, np.deg2rad(-4.0))],
)
def test_golden_single_pair_alignment(true_pose):
    """BASELINE.json config 1: two synthetic 360-beam scans with a known
    relative pose; recover within 1e-3 m / rad."""
    # target scan taken at origin -> world == sensor frame
    tgt_world = _room_scan(n=720, pose=(0.0, 0.0, 0.0), noise=0.0)
    grid = _make_grid(tgt_world, min_pts=3)

    # source scan taken at true_pose (points in its local frame)
    src_local = _room_scan(n=360, pose=true_pose, seed=7, noise=0.0)
    src = pad_points(src_local, 512)

    init = jnp.zeros(3, dtype=jnp.float32)
    res = align(
        init, src.xy, src.mask, grid, D1, D2,
        max_iterations=50, step_size=0.1, trans_eps=1e-4, radius=1,
    )
    est = np.asarray(res.pose_rad, dtype=np.float64)
    assert bool(res.converged)
    err_t = np.hypot(est[0] - true_pose[0], est[1] - true_pose[1])
    err_r = abs(est[2] - true_pose[2])
    assert err_t < 1e-3, (est, true_pose)
    assert err_r < 1e-3, (est, true_pose)


def test_hessian_spd_at_optimum_gives_covariance():
    tgt_world = _room_scan(n=720)
    grid = _make_grid(tgt_world, min_pts=3)
    src = pad_points(_room_scan(n=360, pose=(0.05, 0.02, 0.02), seed=2), 512)
    res = align(jnp.zeros(3), src.xy, src.mask, grid, D1, D2,
                max_iterations=50, trans_eps=1e-4)
    H = np.asarray(res.hessian)
    evals = np.linalg.eigvalsh(H)
    assert evals[0] > 0  # information matrix PD at the optimum
    cov = np.linalg.inv(H)
    assert np.all(np.isfinite(cov))


def test_fitness_score_exact():
    src = pad_points(np.array([[0.0, 0.0], [1.0, 0.0]]), 8)
    tgt = pad_points(np.array([[0.0, 0.1], [1.0, -0.2], [50.0, 50.0]]), 16)
    f = float(fitness_score(src.xy, src.mask, tgt.xy, tgt.mask, chunk=4))
    assert abs(f - (0.1 ** 2 + 0.2 ** 2) / 2.0) < 1e-6


def test_fitness_empty_target_is_big():
    src = pad_points(np.array([[0.0, 0.0]]), 4)
    tgt = pad_points(np.zeros((0, 2)), 8)
    f = float(fitness_score(src.xy, src.mask, tgt.xy, tgt.mask, chunk=4))
    assert f > 1e9
