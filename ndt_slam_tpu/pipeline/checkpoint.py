"""Checkpoint / exact resume of a running SLAM session.

The reference has no mid-run state save — outputs are final-only
(SURVEY.md §5: poses text + PCDs at end of run, src/SlamLauncher.cpp:
113-126). For long multi-host runs this framework checkpoints the
complete FrontEnd state keyed by frame index and resumes EXACTLY:
the resumed trajectory is bit-identical to an uninterrupted run
(enforced by tests/integration/test_checkpoint.py).

Format: a single .npz (numpy archive) holding every array, plus a JSON
manifest for scalars/structure. Everything is host-side numpy at rest;
device buffers are rebuilt on load. No orbax dependency — state is a
few MB of flat arrays and the .npz keeps it dependency-free.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core.points import PointBuffer
from ndt_slam_tpu.mapping.pointcloud_map import Submap
from ndt_slam_tpu.pipeline.frontend import FrontEnd


def _buf_np(buf: Optional[PointBuffer]):
    if buf is None:
        return None
    return np.asarray(buf.xy), np.asarray(buf.mask)


def save_checkpoint(fe: FrontEnd, path: str) -> None:
    """Write the complete FrontEnd state to `path` (.npz)."""
    if getattr(fe, "_queue", None):
        # pipelined frontend with frames in flight: resolve them first
        # so the snapshot is the canonical (host-synchronized) state
        fe.drain()
    if fe.backend is not None:
        # async loop verification in flight would be lost across a
        # resume — resolve it into edges first
        fe.backend._resolve_verify()
    arrays = {}
    meta = {
        "cnt": fe.cnt,
        "has_prev_odo": fe.prev_odo is not None,
        "has_init_pose": fe.init_pose is not None,
        "metrics": fe.metrics,
        "cfg": {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in fe.cfg.to_dict().items()
        },
        "pcmap": {
            "atd": fe.pcmap.atd,
            "has_last_scan": fe.pcmap.last_scan is not None,
            "n_submaps": len(fe.pcmap.submaps),
            "submaps": [],
        },
        "backend": None,
    }

    if fe.prev_odo is not None:
        arrays["prev_odo"] = np.asarray(fe.prev_odo)
    if fe.init_pose is not None:
        arrays["init_pose"] = np.asarray(fe.init_pose)
    arrays["last_cov"] = np.asarray(fe.last_cov)
    arrays["pose_history"] = (
        np.stack(fe.pose_history) if fe.pose_history
        else np.zeros((0, 3), np.float32)
    )
    arrays["cov_history"] = (
        np.stack(fe.cov_history) if fe.cov_history
        else np.zeros((0, 3, 3), np.float32)
    )

    pm = fe.pcmap
    arrays["pcmap_poses"] = (
        np.stack(pm.poses) if pm.poses else np.zeros((0, 3), np.float32)
    )
    arrays["pcmap_last_pose"] = np.asarray(pm.last_pose)
    if pm.last_scan is not None:
        arrays["pcmap_last_scan_xy"], arrays["pcmap_last_scan_mask"] = (
            _buf_np(pm.last_scan)
        )
    for i, s in enumerate(pm.local_scans):
        arrays[f"local_scan_{i}"] = np.asarray(s)
    meta["pcmap"]["n_local_scans"] = len(pm.local_scans)
    # incremental NDT moment lattice: saved so a resumed run keeps the
    # exact f32 summation history (a from-scratch rebuild on load would
    # differ in the low bits and break bit-exact resume)
    if pm._mom_valid and pm._mom is not None:
        arrays["pcmap_mom"] = np.asarray(pm._mom)
        arrays["pcmap_mom_anchor"] = np.asarray(pm._mom_anchor)

    for si, sm in enumerate(pm.submaps):
        sd = {
            "atd_s": sm.atd_s, "cnt_s": sm.cnt_s, "cnt_e": sm.cnt_e,
            "n_scans": sm.n_scans, "is_first": sm.is_first,
            "n_raw": len(sm.raw),
            "has_final": sm.final_cloud is not None,
        }
        meta["pcmap"]["submaps"].append(sd)
        arrays[f"sm{si}_proc_xy"], arrays[f"sm{si}_proc_mask"] = (
            _buf_np(sm.proc)
        )
        arrays[f"sm{si}_proc_count"] = np.asarray(sm.proc_count)
        for ri, rb in enumerate(sm.raw):
            arrays[f"sm{si}_raw{ri}_xy"], arrays[f"sm{si}_raw{ri}_mask"] = (
                _buf_np(rb)
            )
        if sm.final_cloud is not None:
            arrays[f"sm{si}_final_xy"], arrays[f"sm{si}_final_mask"] = (
                _buf_np(sm.final_cloud)
            )

    if fe.backend is not None:
        be = fe.backend
        meta["backend"] = {
            "node_sids": be.node_sids,
            "n_odom_edges": len(be.odom_edges),
            "n_loop_edges": len(be.loop_edges),
            "loops_accepted": be.loops_accepted,
            "kf_sids": be.keyframes.sids,
            "kf_pos_var": be.keyframes.pos_var,
            "cum_pos_var": be._cum_pos_var,
            "pending_edges": be._pending_edges,
            "last_opt_node": be._last_opt_node,
        }
        arrays["be_node_poses"] = (
            np.stack(be.node_poses_rad) if be.node_poses_rad
            else np.zeros((0, 3), np.float32)
        )
        # odometry chain: edge k connects nodes (k, k+1); [K, 12] rows
        arrays["be_odom_edges"] = (
            np.stack([np.concatenate([z, om.reshape(-1)])
                      for z, om in be.odom_edges])
            if be.odom_edges else np.zeros((0, 12), np.float32)
        )
        arrays["be_loop_edges"] = (
            np.stack([
                np.concatenate(
                    [np.array([i, j], np.float32), z, om.reshape(-1)]
                )
                for i, j, z, om in be.loop_edges
            ])
            if be.loop_edges else np.zeros((0, 14), np.float32)
        )
        kf = be.keyframes
        if kf.sids:
            arrays["kf_poses"] = np.stack(kf.poses_deg)
            # scan rows may be device-resident (keyframes.add keeps
            # references): ONE bulk transfer, not a fetch per row
            arrays["kf_scan_xy"] = np.stack(jax.device_get(kf.scan_xy))
            arrays["kf_scan_mask"] = np.stack(
                jax.device_get(kf.scan_mask)
            )

    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, manifest=json.dumps(meta), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, cfg: Optional[SlamConfig] = None,
                    strict: bool = True, mesh=None) -> FrontEnd:
    """Rebuild a FrontEnd from a checkpoint; resumes exactly.

    When `cfg` is passed it must match the checkpoint's stored config
    (`strict=True`, default): capacities size every restored buffer and
    start_frame anchors the resume-skip count, so a silent mismatch
    breaks the exact-resume guarantee. Pass strict=False to knowingly
    override (e.g. changing only output/diagnostic knobs).
    """
    import dataclasses as _dc

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["manifest"]))
    stored = dict(meta["cfg"])
    for k, v in list(stored.items()):
        if isinstance(v, list):
            stored[k] = tuple(v)
    # Manifest compatibility across config evolution: a checkpoint
    # written by an older build may carry keys that are no longer
    # SlamConfig fields (dropped) and lack fields added since (take
    # their defaults). Strict comparison below covers only keys present
    # in BOTH, so old checkpoints stay loadable either way.
    known = {f.name for f in _dc.fields(SlamConfig)}
    stored = {k: v for k, v in stored.items() if k in known}
    if cfg is None:
        cfg = SlamConfig.from_dict(stored)
    elif strict:
        # end_frame/draw_skip only steer the outer loop — changing them
        # is the normal "resume and run further" case, not a mismatch.
        exempt = {"end_frame", "draw_skip"}
        diff = {
            k: (stored.get(k), v)
            for k, v in cfg.to_dict().items()
            if k not in exempt and k in stored and stored.get(k) != v
        }
        if diff:
            raise ValueError(
                f"config mismatch vs checkpoint {path}: "
                + ", ".join(
                    f"{k}: checkpoint={a!r} requested={b!r}"
                    for k, (a, b) in sorted(diff.items())
                )
                + " (pass strict=False to override)"
            )

    if cfg.resolved_pipeline_depth > 0:
        # resume into the pipelined frontend so the run keeps its
        # chunked host sync (state layout is identical: a drained
        # PipelinedFrontEnd is a FrontEnd)
        from ndt_slam_tpu.pipeline.async_frontend import PipelinedFrontEnd
        fe = PipelinedFrontEnd(cfg, mesh=mesh)
    else:
        fe = FrontEnd(cfg, mesh=mesh)
    fe.cnt = int(meta["cnt"])
    fe.metrics = list(meta["metrics"])
    if meta["has_prev_odo"]:
        fe.prev_odo = np.asarray(data["prev_odo"], np.float32)
    if meta["has_init_pose"]:
        fe.init_pose = np.asarray(data["init_pose"], np.float32)
    fe.last_cov = jnp.asarray(data["last_cov"])
    fe.pose_history = [p for p in np.asarray(data["pose_history"])]
    fe.cov_history = [c for c in np.asarray(data["cov_history"])]

    pm = fe.pcmap
    pm.atd = float(meta["pcmap"]["atd"])
    pm.poses = [p for p in np.asarray(data["pcmap_poses"])]
    pm.last_pose = np.asarray(data["pcmap_last_pose"], np.float32)
    if meta["pcmap"]["has_last_scan"]:
        pm.last_scan = PointBuffer(
            jnp.asarray(data["pcmap_last_scan_xy"]),
            jnp.asarray(data["pcmap_last_scan_mask"]),
        )
    pm.local_scans = [
        np.asarray(data[f"local_scan_{i}"])
        for i in range(meta["pcmap"]["n_local_scans"])
    ]
    # device-side scan cache: rebuilt lazily by the remake path (the
    # lists must stay index-aligned — a resumed run's first correction
    # pads/uploads the restored frames once and re-caches)
    pm.local_scans_dev = [None] * len(pm.local_scans)
    if "pcmap_mom" in data:
        mom = np.asarray(data["pcmap_mom"])
        B = cfg.resolved_grid_mom_cells
        if mom.shape[0] == B * B:
            pm._mom = jnp.asarray(mom)
            pm._mom_anchor = jnp.asarray(
                np.asarray(data["pcmap_mom_anchor"], np.int32)
            )
            pm._mom_valid = True
        # else: lattice size changed (non-strict override) — leave
        # invalid; mom_state() rebuilds from the restored buffers

    pm.submaps = []
    for si, sd in enumerate(meta["pcmap"]["submaps"]):
        sm = Submap(cfg, float(sd["atd_s"]), int(sd["cnt_s"]))
        sm.cnt_e = sd["cnt_e"]
        sm.n_scans = int(sd["n_scans"])
        sm.is_first = bool(sd["is_first"])
        sm.proc = PointBuffer(
            jnp.asarray(data[f"sm{si}_proc_xy"]),
            jnp.asarray(data[f"sm{si}_proc_mask"]),
        )
        sm.proc_count = jnp.asarray(data[f"sm{si}_proc_count"])
        sm.raw = [
            PointBuffer(
                jnp.asarray(data[f"sm{si}_raw{ri}_xy"]),
                jnp.asarray(data[f"sm{si}_raw{ri}_mask"]),
            )
            for ri in range(int(sd["n_raw"]))
        ]
        if sd["has_final"]:
            sm.final_cloud = PointBuffer(
                jnp.asarray(data[f"sm{si}_final_xy"]),
                jnp.asarray(data[f"sm{si}_final_mask"]),
            )
        pm.submaps.append(sm)

    if meta["backend"] is not None and fe.backend is not None:
        bm = meta["backend"]
        be = fe.backend
        be.node_sids = [int(s) for s in bm["node_sids"]]
        be.node_poses_rad = [
            p.astype(np.float32) for p in np.asarray(data["be_node_poses"])
        ]
        be.loops_accepted = int(bm["loops_accepted"])
        # drift accumulator + deferred-optimization state (must resume
        # exactly or the candidate radius / correction cadence change)
        be._cum_pos_var = float(bm.get("cum_pos_var", 0.0))
        be._pending_edges = int(bm.get("pending_edges", 0))
        be._last_opt_node = int(bm.get("last_opt_node", -(10 ** 9)))
        be.odom_edges = [
            (row[:3].astype(np.float32),
             row[3:12].reshape(3, 3).astype(np.float32))
            for row in np.asarray(data["be_odom_edges"])
        ]
        be.loop_edges = [
            (int(row[0]), int(row[1]),
             row[2:5].astype(np.float32),
             row[5:14].reshape(3, 3).astype(np.float32))
            for row in np.asarray(data["be_loop_edges"])
        ]
        kf = be.keyframes
        kf.sids = [int(s) for s in bm["kf_sids"]]
        kf.pos_var = [float(v) for v in bm.get(
            "kf_pos_var", [0.0] * len(kf.sids))]
        if kf.sids:
            kf.poses_deg = [p for p in np.asarray(data["kf_poses"])]
            kf.scan_xy = [x for x in np.asarray(data["kf_scan_xy"])]
            kf.scan_mask = [m for m in np.asarray(data["kf_scan_mask"])]
    return fe
