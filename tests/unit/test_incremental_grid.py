"""Incremental NDT moment lattice (VERDICT r4 next-round #2).

The sequential frontend can maintain the registration grid as a
running per-submap-pair moment lattice (cfg.ndt_incremental_grid)
instead of rescattering the whole target buffer every frame. Cells are
keyed by ABSOLUTE lattice index, so the only difference from the
from-scratch build is f32 summation order: these tests pin (a) the
grid-level agreement, (b) end-to-end trajectory agreement at tight
convergence, and (c) the loud fallback when a frame window escapes an
(artificially undersized) lattice.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.io.simulate import simulate_sequence
from ndt_slam_tpu.pipeline.frontend import FrontEnd


def _cfg(**kw):
    # tight convergence: comparing converged optima makes the
    # full-vs-incremental comparison well-defined (same rationale as
    # tests/integration/test_batch_runner._cfg)
    base = dict(end_frame=10_000, ndt_trans_eps=1e-4,
                ndt_max_iterations=80)
    base.update(kw)
    return SlamConfig.small(**base)


def test_lattice_grid_matches_full_build():
    """Window slice of the running lattice == from-scratch build over
    the same points (same cells, ulp-level moments)."""
    from ndt_slam_tpu.ndt.grid import (
        build_grid, lattice_anchor, moments_abs,
        window_grid_from_lattice,
    )

    rng = np.random.default_rng(0)
    res = 0.3
    nx = ny = 64
    B = 96
    # two "clouds" (stand-ins for prev closed cloud + proc buffer)
    a = rng.uniform(-6.0, 6.0, (4000, 2)).astype(np.float32)
    b = rng.uniform(-5.0, 7.0, (3000, 2)).astype(np.float32)
    am = rng.random(4000) < 0.9
    bm = rng.random(3000) < 0.9
    center = jnp.asarray(np.array([0.7, -0.4], np.float32))

    allxy = jnp.concatenate([jnp.asarray(a), jnp.asarray(b)])
    allm = jnp.concatenate([jnp.asarray(am), jnp.asarray(bm)])
    # full build uses absolute-index assignment via the lattice path's
    # own frame window so the comparison isolates the SLICE mechanics
    anchor = lattice_anchor(center, B, res) - 0  # lattice anchor
    mom = (
        moments_abs(jnp.asarray(a), jnp.asarray(am), anchor, B, B, res)
        + moments_abs(jnp.asarray(b), jnp.asarray(bm), anchor, B, B, res)
    )
    fa = lattice_anchor(center, nx, res)
    g_inc, ok = window_grid_from_lattice(
        mom, anchor, B, B, fa, nx, ny, res, min_pts=3,
    )
    assert bool(ok)

    g_full = build_grid(allxy, allm, center, nx, ny, res, min_pts=3)

    v_full = np.asarray(g_full.valid)
    v_inc = np.asarray(g_inc.valid)
    # identical valid sets (cell assignment is identical up to ulp;
    # random points don't sit on cell boundaries)
    assert (v_full == v_inc).all()
    both = v_full & v_inc
    np.testing.assert_allclose(
        np.asarray(g_full.mean)[both], np.asarray(g_inc.mean)[both],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(g_full.inv_cov)[both],
        np.asarray(g_inc.inv_cov)[both],
        rtol=2e-3, atol=2e-2,
    )


@pytest.mark.parametrize("remove_moving", [True, False])
def test_incremental_matches_full_end_to_end(remove_moving):
    cfg0 = _cfg(ndt_incremental_grid=0, remove_moving=remove_moving)
    cfg1 = _cfg(ndt_incremental_grid=1, remove_moving=remove_moving)
    frames = simulate_sequence(n_frames=20, beams=181, seed=3)
    fe0, fe1 = FrontEnd(cfg0), FrontEnd(cfg1)
    for fr in frames:
        fe0.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
        fe1.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
    assert fe1.n_grid_fallbacks == 0
    a = np.stack(fe0.pose_history)
    b = np.stack(fe1.pose_history)
    # f32 summation-order noise compounds through the map feedback;
    # measured ceiling ~mm over 20 frames (same scale as the batch
    # runner's vmap-reduction noise). A wrong lattice is meters off.
    d = np.hypot(a[:, 0] - b[:, 0], a[:, 1] - b[:, 1])
    assert d.max() < 0.02, d.max()
    dth = np.abs((a[:, 2] - b[:, 2] + 180.0) % 360.0 - 180.0)
    assert dth.max() < 0.2, dth.max()
    # same submap structure (close decisions agreed)
    assert len(fe0.pcmap.submaps) == len(fe1.pcmap.submaps)


def test_incremental_matches_full_after_proc_overflow():
    """Regression (killian_robot, round 5): once the submap proc
    buffer fills, cloud() drops the newest scan's overflow from the
    target buffer — the fresh newest-scan moments must drop the SAME
    points (validity-rank >= remaining capacity) or the incremental
    grid systematically diverges in the second half of every submap
    (measured: 2.7x ATE on killian_robot before the fix). A tiny
    max_submap_points forces the overflow within a few frames."""
    kw = dict(max_submap_points=1024, submap_sep_thre=50.0)
    cfg0 = _cfg(ndt_incremental_grid=0, **kw)
    cfg1 = _cfg(ndt_incremental_grid=1, **kw)
    frames = simulate_sequence(n_frames=16, beams=361, seed=3)
    fe0, fe1 = FrontEnd(cfg0), FrontEnd(cfg1)
    for fr in frames:
        fe0.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
        fe1.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
    # the buffer really overflowed (newest-scan truncation active)
    assert int(np.asarray(fe0.pcmap.submaps[-1].proc_count)) >= 1024
    a = np.stack(fe0.pose_history)
    b = np.stack(fe1.pose_history)
    d = np.hypot(a[:, 0] - b[:, 0], a[:, 1] - b[:, 1])
    assert d.max() < 0.02, d.max()


def test_escape_fallback_matches_full():
    """An undersized lattice (zero margin) forces window escapes; the
    frontend must detect them (grid_ok), redo those frames through the
    full rebuild, and still track the full-grid trajectory."""
    cfg0 = _cfg(ndt_incremental_grid=0)
    cfg1 = _cfg(ndt_incremental_grid=1,
                grid_mom_cells=96)  # == grid window: escapes quickly
    frames = simulate_sequence(n_frames=16, beams=181, seed=3)
    fe0, fe1 = FrontEnd(cfg0), FrontEnd(cfg1)
    for fr in frames:
        fe0.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
        fe1.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
    assert fe1.n_grid_fallbacks > 0  # escapes really happened
    a = np.stack(fe0.pose_history)
    b = np.stack(fe1.pose_history)
    d = np.hypot(a[:, 0] - b[:, 0], a[:, 1] - b[:, 1])
    assert d.max() < 0.02, d.max()


def test_pipelined_incremental_bit_exact_vs_sync():
    """The pipelined frontend's speculation/rollback contract must hold
    with the incremental lattice in the loop: trajectory BIT-IDENTICAL
    to the synchronous FrontEnd running the same incremental path
    (the lattice is part of the rollback snapshot)."""
    from ndt_slam_tpu.pipeline.async_frontend import PipelinedFrontEnd

    cfg = _cfg(ndt_incremental_grid=1, submap_sep_thre=2.0)
    frames = simulate_sequence(n_frames=24, beams=181, seed=5)
    fe_s = FrontEnd(cfg)
    fe_p = PipelinedFrontEnd(cfg, depth=6)
    for fr in frames:
        fe_s.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
        fe_p.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
    fe_p.drain()
    assert len(fe_s.pcmap.submaps) >= 2  # closes (rollbacks) happened
    a = np.stack(fe_s.pose_history)
    b = np.stack(fe_p.pose_history)
    np.testing.assert_array_equal(a, b)


def test_checkpoint_roundtrip_preserves_lattice():
    """Resume must keep the exact lattice (f32 summation history), not
    rebuild it — bit-exact resume depends on it."""
    import os
    import tempfile

    from ndt_slam_tpu.pipeline.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    cfg = _cfg(ndt_incremental_grid=1)
    frames = simulate_sequence(n_frames=14, beams=181, seed=3)
    fe = FrontEnd(cfg)
    for fr in frames[:10]:
        fe.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_checkpoint(fe, path)
        fe2 = load_checkpoint(path, cfg)
        assert fe2.pcmap._mom_valid
        np.testing.assert_array_equal(
            np.asarray(fe.pcmap.mom_state()[0]),
            np.asarray(fe2.pcmap.mom_state()[0]),
        )
        # and the continuation is bit-identical
        for fr in frames[10:]:
            fe.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
            fe2.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
        np.testing.assert_array_equal(
            np.stack(fe.pose_history), np.stack(fe2.pose_history)
        )


def test_remake_after_checkpoint_load():
    """Regression (round 5): load_checkpoint restored local_scans but
    left the device-side scan cache (local_scans_dev) empty, so the
    first post-resume map rewrite crashed with IndexError. A remake
    right after load must rebuild from lazily re-cached buffers."""
    import os
    import tempfile

    from ndt_slam_tpu.pipeline.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    cfg = _cfg(ndt_incremental_grid=1)
    frames = simulate_sequence(n_frames=10, beams=181, seed=3)
    fe = FrontEnd(cfg)
    for fr in frames:
        fe.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_checkpoint(fe, path)
        fe2 = load_checkpoint(path, cfg)
        poses = np.stack(fe2.pose_history)
        fe2.pcmap.remake_maps(poses, thresh_trans=-1.0)  # full rebuild
        # and the rebuilt map matches the original's
        ga = fe.pcmap.global_map()
        gb = fe2.pcmap.global_map()
        assert abs(len(ga) - len(gb)) <= 0.01 * max(len(ga), 1)
