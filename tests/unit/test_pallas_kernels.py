"""Parity of the Pallas TPU kernels (interpret mode on CPU) against the
reference engines they replace: ndt/compact.py and ndt/fitness.py.
Identical math is the contract — the kernels only change where the
[N,K] pair intermediates live (VMEM instead of HBM)."""

import numpy as np
import jax.numpy as jnp

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core.points import pad_points
from ndt_slam_tpu.ndt.grid import build_grid
from ndt_slam_tpu.ndt.compact import (
    compact_grid,
    ndt_negative_score_compact,
    ndt_score_grad_hess_compact,
)
from ndt_slam_tpu.ndt.score import gauss_constants
from ndt_slam_tpu.ndt import pallas_kernels as pk
from ndt_slam_tpu.ndt.fitness import fitness_score, nn_sq_dists

from tests.distributed.test_sharded_register import _room_scan


CFG = SlamConfig(
    grid_cells_x=64, grid_cells_y=64,
    ndt_min_points_per_cell=3, ndt_max_active_cells=512,
)


def _setup():
    tgt = pad_points(_room_scan(720, noise=0.01), 2048)
    src = pad_points(
        _room_scan(360, pose=(0.1, -0.06, 0.05), noise=0.01, seed=3), 512
    )
    grid = build_grid(
        tgt.xy, tgt.mask, jnp.zeros(2, jnp.float32),
        CFG.grid_cells_x, CFG.grid_cells_y, CFG.ndt_resolution,
        min_pts=CFG.ndt_min_points_per_cell,
    )
    cg = compact_grid(grid, CFG.ndt_max_active_cells)
    d1, d2 = gauss_constants(CFG.ndt_resolution, CFG.ndt_outlier_ratio)
    return src, tgt, cg, d1, d2


def test_sgh_pallas_matches_compact():
    src, _tgt, cg, d1, d2 = _setup()
    pose = jnp.array([0.08, -0.04, 0.03], jnp.float32)
    E0, g0, H0, m0 = ndt_score_grad_hess_compact(
        pose, src.xy, src.mask, cg, d1, d2, 1
    )
    E1, g1, H1, m1 = pk.ndt_score_grad_hess_pallas(
        pose, src.xy, src.mask, cg, d1, d2, 1
    )
    np.testing.assert_allclose(float(E1), float(E0), rtol=1e-5)
    assert float(m1) == float(m0)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(H1), np.asarray(H0), rtol=1e-3, atol=0.05
    )
    # symmetric Hessian by construction
    np.testing.assert_array_equal(np.asarray(H1), np.asarray(H1).T)


def test_scores_pallas_matches_compact():
    src, _tgt, cg, d1, d2 = _setup()
    base = jnp.array([0.08, -0.04, 0.03], jnp.float32)
    poses = base[None, :] + (
        jnp.linspace(-0.03, 0.03, 12)[:, None]
        * jnp.array([1.0, -0.5, 0.3], jnp.float32)
    )
    want = jnp.stack(
        [
            ndt_negative_score_compact(p, src.xy, src.mask, cg, d1, d2, 1)
            for p in poses
        ]
    )
    got = pk.ndt_scores_pallas(poses, src.xy, src.mask, cg, d1, d2, 1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4
    )


def test_nn_and_fitness_pallas_match_reference():
    src, tgt, _cg, _d1, _d2 = _setup()
    ref = np.asarray(nn_sq_dists(src.xy, src.mask, tgt.xy, tgt.mask))
    got = np.asarray(
        pk.nn_sq_dists_pallas(src.xy, src.mask, tgt.xy, tgt.mask)
    )
    m = np.asarray(src.mask)
    # atol-dominated: the MXU reference form |s|^2+|t|^2-2s.t loses
    # ~1e-5 absolute to cancellation at map-scale coordinates; the
    # kernel's difference form is the more accurate of the two.
    np.testing.assert_allclose(got[m], ref[m], rtol=0, atol=2e-5)

    f_ref = float(fitness_score(src.xy, src.mask, tgt.xy, tgt.mask))
    f_got = float(
        pk.fitness_score_pallas(src.xy, src.mask, tgt.xy, tgt.mask)
    )
    np.testing.assert_allclose(f_got, f_ref, rtol=1e-4)


def test_fitness_pallas_empty_target():
    src, _tgt, _cg, _d1, _d2 = _setup()
    empty_xy = jnp.zeros((256, 2), jnp.float32)
    empty_mask = jnp.zeros((256,), bool)
    f = float(
        pk.fitness_score_pallas(src.xy, src.mask, empty_xy, empty_mask)
    )
    assert f >= 1e11  # _BIG sentinel: no targets -> no fitness


def test_align_pallas_engine_recovers_pose():
    """End-to-end Newton solve with the Pallas engine (interpret mode)."""
    from ndt_slam_tpu.ndt.solve import align

    src, _tgt, cg, d1, d2 = _setup()
    init = jnp.zeros(3, jnp.float32)
    r = align(
        init, src.xy, src.mask, cg, d1, d2,
        max_iterations=30, step_size=0.1, trans_eps=1e-4, radius=1,
        use_pallas=True,
    )
    assert bool(r.converged)
    est = np.asarray(r.pose_rad)
    assert np.hypot(est[0] - 0.10, est[1] + 0.06) < 2e-2, est
    assert abs(est[2] - 0.05) < 1e-2, est
