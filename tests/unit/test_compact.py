"""Compact-cell NDT engine parity vs the gather engine (ndt/score.py)
and the autodiff oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from ndt_slam_tpu.core.points import pad_points
from ndt_slam_tpu.ndt.compact import (
    compact_grid,
    ndt_negative_score_compact,
    ndt_score_grad_hess_compact,
)
from ndt_slam_tpu.ndt.grid import build_grid
from ndt_slam_tpu.ndt.score import (
    gauss_constants,
    ndt_negative_score,
    ndt_score_grad_hess,
)
from ndt_slam_tpu.ndt.solve import align

RES = 0.3
D1, D2 = gauss_constants(RES)


def _room_scan(n, pose=(0.0, 0.0, 0.0), noise=0.01, seed=0):
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


def _setup(center=(0.0, 0.0), offset=(0.0, 0.0)):
    tgt = _room_scan(1440) + np.asarray(offset, np.float32)
    buf = pad_points(tgt, 4096)
    grid = build_grid(
        buf.xy, buf.mask,
        jnp.array(center, jnp.float32) + jnp.asarray(offset, jnp.float32),
        96, 96, RES, min_pts=3,
    )
    cg = compact_grid(grid, 1024)
    src_pts = _room_scan(360, pose=(0.1, -0.05, 0.04), seed=2)
    src_pts = src_pts + np.asarray(offset, np.float32)
    src = pad_points(src_pts, 512)
    return grid, cg, src


def test_compact_matches_gather_engine():
    grid, cg, src = _setup()
    assert int(cg.valid.sum()) == int(grid.valid.sum())
    for pose in [
        jnp.zeros(3, jnp.float32),
        jnp.array([0.07, -0.03, 0.05], jnp.float32),
        jnp.array([0.3, 0.2, -0.2], jnp.float32),
    ]:
        E1, g1, H1, m1 = ndt_score_grad_hess(
            pose, src.xy, src.mask, grid, D1, D2, 1
        )
        E2, g2, H2, m2 = ndt_score_grad_hess_compact(
            pose, src.xy, src.mask, cg, D1, D2, 1
        )
        assert float(m1) == float(m2), (float(m1), float(m2))
        np.testing.assert_allclose(float(E1), float(E2), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(H1), np.asarray(H2), rtol=1e-3, atol=1e-2
        )
        s1 = ndt_negative_score(pose, src.xy, src.mask, grid, D1, D2, 1)
        s2 = ndt_negative_score_compact(pose, src.xy, src.mask, cg, D1, D2, 1)
        np.testing.assert_allclose(float(s1), float(s2), rtol=1e-5)


def test_compact_matches_at_map_scale_coordinates():
    """Far from the origin (f32 stress): engines still agree."""
    grid, cg, src = _setup(offset=(220.0, -175.0))
    pose = jnp.array([220.05, -175.02, 0.03], jnp.float32)
    E1, g1, H1, m1 = ndt_score_grad_hess(
        pose, src.xy, src.mask, grid, D1, D2, 1
    )
    E2, g2, H2, m2 = ndt_score_grad_hess_compact(
        pose, src.xy, src.mask, cg, D1, D2, 1
    )
    assert float(m1) == float(m2)
    np.testing.assert_allclose(float(E1), float(E2), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-2
    )


def test_compact_grad_matches_autodiff():
    _, cg, src = _setup()
    pose = jnp.array([0.06, -0.02, 0.03], jnp.float32)
    f = lambda p: ndt_negative_score_compact(
        p, src.xy, src.mask, cg, D1, D2, 1
    )
    E, g, H, _ = ndt_score_grad_hess_compact(
        pose, src.xy, src.mask, cg, D1, D2, 1
    )
    np.testing.assert_allclose(float(E), float(f(pose)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(jax.grad(f)(pose)), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(H), np.asarray(jax.hessian(f)(pose)), rtol=5e-3, atol=5e-3
    )


def test_align_with_compact_grid_recovers_pose():
    grid, cg, _ = _setup()
    true_pose = (0.10, -0.06, 0.05)
    src = pad_points(_room_scan(360, pose=true_pose, noise=0.0, seed=7), 512)
    res = align(
        jnp.zeros(3, jnp.float32), src.xy, src.mask, cg, D1, D2,
        max_iterations=50, trans_eps=1e-4,
    )
    assert bool(res.converged)
    est = np.asarray(res.pose_rad)
    assert np.hypot(est[0] - true_pose[0], est[1] - true_pose[1]) < 2e-3
    assert abs(est[2] - true_pose[2]) < 2e-3


def test_compact_overflow_drops_cells_but_stays_valid():
    grid, _, src = _setup()
    small = compact_grid(grid, 8)  # way under the valid count
    E, g, H, m = ndt_score_grad_hess_compact(
        jnp.zeros(3, jnp.float32), src.xy, src.mask, small, D1, D2, 1
    )
    assert np.isfinite(float(E))
    assert float(m) >= 0.0
