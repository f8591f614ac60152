"""Mapping subsystem tests: voxel filter, occupancy diff, dynamic
removal, submap lifecycle (reference semantics: src/PointCloudMap.cpp,
include/ndt_slam/PCFilter.h)."""

import numpy as np
import jax.numpy as jnp

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core.points import pad_points, PointBuffer
from ndt_slam_tpu.mapping import (
    voxel_filter, occupancy_diff_mask, keep_far_from_mask,
    process_interior_scan, PointCloudMap,
)


def test_voxel_filter_centroids():
    pts = np.array([
        [0.01, 0.01], [0.02, 0.03], [0.03, 0.02],   # cell (0,0)
        [0.11, 0.01],                                # cell (2,0) @ leaf 0.05
    ])
    buf = pad_points(pts, 16)
    out = voxel_filter(buf, 0.05)
    got = np.asarray(out.xy)[np.asarray(out.mask)]
    assert got.shape[0] == 2
    got = got[np.argsort(got[:, 0])]
    assert np.allclose(got[0], [0.02, 0.02], atol=1e-6)
    assert np.allclose(got[1], [0.11, 0.01], atol=1e-6)


def test_voxel_filter_empty():
    buf = pad_points(np.zeros((0, 2)), 8)
    out = voxel_filter(buf, 0.05)
    assert int(out.count()) == 0


def test_voxel_filter_negative_coords():
    pts = np.array([[-1.23, -4.56], [-1.22, -4.57]])
    out = voxel_filter(pad_points(pts, 8), 0.05)
    got = np.asarray(out.xy)[np.asarray(out.mask)]
    assert got.shape[0] == 1
    assert np.allclose(got[0], pts.mean(0), atol=1e-6)


def test_occupancy_diff():
    base = pad_points(np.array([[0.0, 0.0], [1.0, 1.0]]), 8)
    test = pad_points(np.array([[0.01, 0.01], [2.0, 2.0], [1.02, 1.01]]), 8)
    diff = occupancy_diff_mask(base.xy, base.mask, test.xy, test.mask, 0.05)
    got = np.asarray(diff)[:3]
    # [0.01,0.01] shares base voxel, [2,2] appears, [1.02,1.01] shares
    assert got.tolist() == [False, True, False]


def test_keep_far_from():
    pts = pad_points(np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]), 8)
    cand = pad_points(np.array([[1.05, 0.0]]), 4)
    keep = keep_far_from_mask(pts.xy, pts.mask, cand.xy, cand.mask, 0.2)
    assert np.asarray(keep)[:3].tolist() == [True, False, True]
    # no candidates -> all kept (reference flag-stays-true behavior)
    none = pad_points(np.zeros((0, 2)), 4)
    keep2 = keep_far_from_mask(pts.xy, pts.mask, none.xy, none.mask, 0.2)
    assert np.asarray(keep2)[:3].tolist() == [True, True, True]


def test_process_interior_removes_mover():
    # static wall points present in all 3 scans; a "mover" only in cur
    wall = np.stack([np.linspace(0, 2, 21), np.zeros(21)], axis=1)
    mover = np.array([[1.0, 1.0], [1.05, 1.0]])
    prev = pad_points(wall, 64)
    nxt = pad_points(wall + [0.001, 0.0], 64)
    cur = pad_points(np.concatenate([wall, mover]), 64)
    out = process_interior_scan(prev, cur, nxt, resol=0.05, thre_neighbor=0.2)
    got = np.asarray(out.xy)[np.asarray(out.mask)]
    # mover gone, wall kept
    assert got.shape[0] == 21
    assert np.all(got[:, 1] < 0.5)


def test_submap_lifecycle_and_local_map():
    cfg = SlamConfig.small(submap_sep_thre=2.0, remove_moving=False)
    pm = PointCloudMap(cfg)
    rng = np.random.default_rng(0)
    # walk 6 m in x, one scan (a small blob) per 0.5 m
    n_scans = 13
    for i in range(n_scans):
        pose = np.array([0.5 * i, 0.0, 0.0], dtype=np.float32)
        pts = pose[:2] + rng.standard_normal((40, 2)).astype(np.float32) * 0.3
        pm.add_pose(pose)
        pm.add_points(pad_points(pts, cfg.max_scan_points))
        pm.set_last_pose(pose)
    # sep_thre=2.0 m -> several submaps
    assert len(pm.submaps) >= 2
    # closed submaps have filtered clouds
    for sm in pm.submaps[:-1]:
        assert sm.final_cloud is not None
        assert int(sm.final_cloud.count()) > 0
    lm = pm.local_map()
    assert lm.capacity == cfg.max_local_map_points
    assert int(lm.count()) > 0
    gm = pm.global_map()
    assert gm.shape[0] > 0 and gm.shape[1] == 2
    # atd accumulated ~ 6 m
    assert abs(pm.atd - 0.5 * (n_scans - 1)) < 1e-3


def test_submap_carryover_seeding():
    cfg = SlamConfig.small(submap_sep_thre=1.0, remove_moving=True)
    pm = PointCloudMap(cfg)
    for i in range(8):
        pose = np.array([0.4 * i, 0.0, 0.0], dtype=np.float32)
        pts = pose[:2] + np.random.default_rng(i).standard_normal((30, 2)) * 0.2
        pm.add_pose(pose)
        pm.add_points(pad_points(pts.astype(np.float32), cfg.max_scan_points))
    assert len(pm.submaps) >= 2
    # new submap was seeded with 2 carried scans + the triggering scan
    newest = pm.submaps[-1]
    assert newest.n_scans >= 3


def _buf_eq(a: PointBuffer, b: PointBuffer):
    """Two buffers hold the same valid point SET (order-insensitive)."""
    axy = np.asarray(a.xy)[np.asarray(a.mask)]
    bxy = np.asarray(b.xy)[np.asarray(b.mask)]
    if axy.shape != bxy.shape:
        return False
    ka = np.lexsort((axy[:, 1], axy[:, 0]))
    kb = np.lexsort((bxy[:, 1], bxy[:, 0]))
    return np.allclose(axy[ka], bxy[kb], atol=1e-6)


def _walk_scans(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        pose = np.array([0.45 * i, 0.0, 0.0], dtype=np.float32)
        pts = pose[:2] + rng.standard_normal((35, 2)).astype(np.float32) * 0.25
        out.append((pose, pts.astype(np.float32)))
    return out


def test_fused_add_points_matches_unfused():
    """The fused add_points(make_target=True) path (one device program:
    add_scan + cloud + registration target) must agree with the unfused
    op-by-op path in both proc buffers and the produced target, across
    submap closes, in every config mode (remove_moving on/off,
    ndt_target_filtered on/off)."""
    for remove_moving in (True, False):
        for filtered in (True, False):
            cfg = SlamConfig.small(
                submap_sep_thre=1.5, remove_moving=remove_moving,
                ndt_target_filtered=filtered,
            )
            pm_f = PointCloudMap(cfg)
            pm_u = PointCloudMap(cfg)
            for pose, pts in _walk_scans(9):
                scan = pad_points(pts, cfg.max_scan_points)
                for pm, mk in ((pm_f, True), (pm_u, False)):
                    pm.add_pose(pose)
                    pm.add_points(scan, make_target=mk)
                    pm.set_last_pose(pose)
                tgt_f = pm_f.registration_target()
                tgt_u = pm_u.registration_target()
                key = (remove_moving, filtered, len(pm_f.submaps))
                assert _buf_eq(tgt_f, tgt_u), key
                cur_f, cur_u = pm_f.submaps[-1], pm_u.submaps[-1]
                assert cur_f.n_scans == cur_u.n_scans, key
                assert _buf_eq(cur_f.proc, cur_u.proc), key
            assert len(pm_f.submaps) == len(pm_u.submaps) >= 2


def _build_pipeline_map(cfg, n=12, seed=3):
    """A PointCloudMap grown the way FrontEnd grows it (local scans
    recorded for remake), returning the map."""
    from ndt_slam_tpu.core.pose2 import global_points
    from ndt_slam_tpu.core.points import PAD_COORD

    rng = np.random.default_rng(seed)
    pm = PointCloudMap(cfg)
    for i in range(n):
        pose = np.array([0.45 * i, 0.02 * i, 2.0 * i], dtype=np.float32)
        local = rng.standard_normal((35, 2)).astype(np.float32) * 0.8
        buf = pad_points(local, cfg.max_scan_points)
        g = global_points(jnp.asarray(pose), buf.xy)
        gbuf = PointBuffer(jnp.where(buf.mask[:, None], g, PAD_COORD),
                           buf.mask)
        pm.add_pose(pose)
        pm.add_points(gbuf, make_target=True)
        pm.set_last_pose(pose)
        pm.record_local_scan(local)
    return pm


def test_remake_maps_incremental_matches_full():
    """Incremental remake (skip submaps whose poses didn't move) must
    produce the same clouds as a forced full rebuild when the early
    trajectory is untouched — and must actually skip those submaps."""
    for remove_moving in (True, False):
        cfg = SlamConfig.small(submap_sep_thre=1.5,
                               remove_moving=remove_moving)
        pm_inc = _build_pipeline_map(cfg)
        pm_full = _build_pipeline_map(cfg)
        assert len(pm_inc.submaps) >= 3  # several closed + one open

        new_poses = np.stack(pm_inc.poses).astype(np.float32)
        new_poses[8:, 0] += 0.3          # correction moves only the tail
        new_poses[8:, 2] += 1.5

        pm_inc.remake_maps(new_poses)    # cfg thresholds (0.05 m)
        pm_full.remake_maps(new_poses, thresh_trans=-1.0, thresh_rot=-1.0)

        assert pm_full.remake_stats["kept"] == 0
        assert pm_inc.remake_stats["kept"] >= 1, remove_moving
        assert pm_inc.remake_stats["rebuilt"] >= 1

        assert len(pm_inc.submaps) == len(pm_full.submaps)
        for k, (sa, sb) in enumerate(
                zip(pm_inc.submaps[:-1], pm_full.submaps[:-1])):
            assert sa.cnt_s == sb.cnt_s and sa.cnt_e == sb.cnt_e
            assert _buf_eq(sa.final_cloud, sb.final_cloud), (
                remove_moving, k)
        assert _buf_eq(pm_inc.submaps[-1].cloud(),
                       pm_full.submaps[-1].cloud())
        assert _buf_eq(pm_inc.registration_target(),
                       pm_full.registration_target())
        assert abs(pm_inc.atd - pm_full.atd) < 1e-5


def test_remake_maps_preserves_growth():
    """After an incremental remake the map keeps growing correctly:
    the open submap's raw tail was rebuilt, so subsequent add_points
    (incl. a submap close) behave exactly like a never-corrected map
    fed the corrected poses from the start."""
    from ndt_slam_tpu.core.pose2 import global_points
    from ndt_slam_tpu.core.points import PAD_COORD

    cfg = SlamConfig.small(submap_sep_thre=1.5, remove_moving=True)
    pm = _build_pipeline_map(cfg, n=10)
    new_poses = np.stack(pm.poses).astype(np.float32)
    new_poses[:, 0] += 0.1  # move everything -> all submaps rebuild
    pm.remake_maps(new_poses)

    # reference: a map built with the corrected poses from scratch
    ref = PointCloudMap(cfg)
    rng = np.random.default_rng(3)
    locals_ = [rng.standard_normal((35, 2)).astype(np.float32) * 0.8
               for _ in range(10)]
    for pose, local in zip(new_poses, locals_):
        buf = pad_points(local, cfg.max_scan_points)
        g = global_points(jnp.asarray(pose), buf.xy)
        gbuf = PointBuffer(jnp.where(buf.mask[:, None], g, PAD_COORD),
                           buf.mask)
        ref.add_pose(pose)
        ref.add_points(gbuf, make_target=True)
        ref.set_last_pose(pose)
        ref.record_local_scan(local)

    # grow both by 3 more frames (crosses a submap close)
    rng2a, rng2b = (np.random.default_rng(99), np.random.default_rng(99))
    for j in range(3):
        pose = new_poses[-1] + np.array(
            [0.45 * (j + 1), 0.0, 0.0], np.float32)
        local = rng2a.standard_normal((35, 2)).astype(np.float32) * 0.8
        local_b = rng2b.standard_normal((35, 2)).astype(np.float32) * 0.8
        for m, lo in ((pm, local), (ref, local_b)):
            buf = pad_points(lo, cfg.max_scan_points)
            g = global_points(jnp.asarray(pose), buf.xy)
            gbuf = PointBuffer(
                jnp.where(buf.mask[:, None], g, PAD_COORD), buf.mask)
            m.add_pose(pose)
            m.add_points(gbuf, make_target=True)
            m.set_last_pose(pose)
            m.record_local_scan(lo)

    assert len(pm.submaps) == len(ref.submaps)
    assert _buf_eq(pm.registration_target(), ref.registration_target())
