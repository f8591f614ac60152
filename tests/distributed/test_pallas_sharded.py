"""Pallas engine under the device mesh (interpret mode on CPU): the
batched/sharded execution paths must produce the same results as the
compact engine they accelerate — no silent downgrades (the kernels are
the TPU-fast path and every production path must be able to run them).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core.points import pad_points
from ndt_slam_tpu.parallel import (
    make_batch_register, make_mesh, make_sharded_register,
)

from tests.distributed.test_sharded_register import _room_scan

CFG_PALLAS = SlamConfig(
    grid_cells_x=64, grid_cells_y=64,
    ndt_min_points_per_cell=3, ndt_max_iterations=80,
    ndt_trans_eps=1e-4, ndt_engine="pallas", ndt_max_active_cells=512,
)
CFG_COMPACT = CFG_PALLAS.replace(ndt_engine="compact")


@pytest.fixture(scope="module")
def pair():
    tgt = pad_points(_room_scan(720, noise=0.01), 4096)
    src = pad_points(
        _room_scan(360, pose=(0.03, 0.02, -0.03), noise=0.01, seed=3), 1024
    )
    return src, tgt


def test_sharded_register_pallas_matches_compact(pair):
    src, tgt = pair
    mesh = make_mesh(8, dp=1)
    init = jnp.zeros(3, jnp.float32)
    center = jnp.zeros(2, jnp.float32)
    args = (src.xy, src.mask, tgt.xy, tgt.mask, init, center)
    out_p = make_sharded_register(mesh, CFG_PALLAS)(*args)
    out_c = make_sharded_register(mesh, CFG_COMPACT)(*args)
    assert bool(out_p.converged) and bool(out_c.converged)
    np.testing.assert_allclose(
        np.asarray(out_p.pose_rad), np.asarray(out_c.pose_rad), atol=2e-4
    )
    np.testing.assert_allclose(
        float(out_p.cost), float(out_c.cost), rtol=1e-3, atol=1e-6
    )


def test_batch_register_pallas_matches_compact(pair):
    """dp x pt mesh, engine='pallas': the vmapped+sharded Pallas kernels
    must agree with the compact engine per batch row."""
    _, tgt = pair
    mesh = make_mesh(8, dp=2)
    poses = [(0.03, 0.02, -0.03), (-0.02, 0.03, 0.04)]
    srcs = [
        pad_points(_room_scan(360, pose=p, noise=0.01, seed=i), 1024)
        for i, p in enumerate(poses)
    ]
    B = 2
    args = (
        jnp.stack([s.xy for s in srcs]),
        jnp.stack([s.mask for s in srcs]),
        jnp.broadcast_to(tgt.xy, (B,) + tgt.xy.shape),
        jnp.broadcast_to(tgt.mask, (B,) + tgt.mask.shape),
        jnp.zeros((B, 3), jnp.float32),
        jnp.zeros((B, 2), jnp.float32),
    )
    out_p = make_batch_register(mesh, CFG_PALLAS)(*args)
    out_c = make_batch_register(mesh, CFG_COMPACT)(*args)
    for i, p in enumerate(poses):
        assert bool(out_p.converged[i])
        np.testing.assert_allclose(
            np.asarray(out_p.pose_rad)[i], np.asarray(out_c.pose_rad)[i],
            atol=2e-4,
        )
        est = np.asarray(out_p.pose_rad)[i]
        assert np.hypot(est[0] - p[0], est[1] - p[1]) < 2e-2
        assert abs(est[2] - p[2]) < 1e-2


def test_sharded_verify_matches_single_device():
    """Loop-closure candidate verification fanned out over the dp axis
    must match the single-device batched verifier (both engines)."""
    from ndt_slam_tpu.graph.loop_closure import (
        make_sharded_verify, verify_candidates,
    )

    cfg = SlamConfig.small(
        loop_stage_mults=(4, 2, 1), ndt_min_points_per_cell=3,
        ndt_max_active_cells=512,
    )
    cur = pad_points(
        _room_scan(360, pose=(0.8, -0.5, 0.4), noise=0.01, seed=5), 512
    )
    # candidates: one genuine revisit (same room), one far/garbage
    old = pad_points(_room_scan(360, noise=0.01, seed=6), 512)
    junk_xy = np.full((512, 2), 1e6, np.float32)
    B = 4
    tgt_xy = np.zeros((B, 512, 2), np.float32)
    tgt_mask = np.zeros((B, 512), bool)
    tgt_xy[0] = np.asarray(old.xy); tgt_mask[0] = np.asarray(old.mask)
    tgt_xy[1] = junk_xy                      # mask stays False
    init = np.zeros((B, 3), np.float32)
    init[0] = [0.7, -0.45, 0.35]             # loop-scale initial error

    args = (
        cur.xy, cur.mask,
        jnp.asarray(tgt_xy), jnp.asarray(tgt_mask), jnp.asarray(init),
    )
    ref = verify_candidates(cfg, *args)
    mesh = make_mesh(8, dp=4)
    got = make_sharded_verify(mesh, cfg)(*args)

    np.testing.assert_array_equal(
        np.asarray(got.accepted), np.asarray(ref.accepted)
    )
    assert bool(np.asarray(got.accepted)[0])
    assert not np.asarray(got.accepted)[1:].any()
    np.testing.assert_allclose(
        np.asarray(got.rel_pose_rad)[0], np.asarray(ref.rel_pose_rad)[0],
        atol=5e-4,
    )
    # the genuine candidate recovered the true relative pose
    np.testing.assert_allclose(
        np.asarray(got.rel_pose_rad)[0], [0.8, -0.5, 0.4], atol=2e-2
    )
