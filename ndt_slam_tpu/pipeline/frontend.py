"""Per-frame SLAM step (the reference's FrontEnd + ScanMatcher).

One compiled `_registration_step` does everything numerical for a frame
in a single XLA program (reference call stack SURVEY.md §3.2-3.3):

    odometry motion -> predicted pose -> source voxel downsample ->
    NDT grid build over the local map -> Newton align -> fitness ->
    NDT covariance from the Hessian -> accept/reject (jnp.where) ->
    Kalman fuse (or odometry-only propagation) -> map-frame points.

The host FrontEnd wrapper owns the first-scan bootstrap, the map
bookkeeping (PointCloudMap), and the metrics trail. Shapes are fixed by
SlamConfig capacities, so the step compiles exactly once.

Parity notes (SURVEY.md §6.3): cost forced to failed_cost when the
solve is unusable (src/PoseEstimator.cpp:44-46); accept iff
cost <= score_thre (src/ScanMatcher.cpp:50-53); on reject the pose is
the odometry prediction and covariance grows by the motion model only
(src/ScanMatcher.cpp:63-66); the first frame enters the map at its raw
odometry pose with zero covariance (src/ScanMatcher.cpp:9-22).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core import pose2
from ndt_slam_tpu.core.points import PointBuffer, PAD_COORD, pad_points
from ndt_slam_tpu.mapping.voxel import voxel_filter
from ndt_slam_tpu.mapping.pointcloud_map import PointCloudMap
from ndt_slam_tpu.ndt.compact import compact_grid
from ndt_slam_tpu.ndt.grid import build_grid
from ndt_slam_tpu.ndt.score import gauss_constants
from ndt_slam_tpu.ndt.solve import align
from ndt_slam_tpu.ndt.fitness import fitness_score
from ndt_slam_tpu.fuse.ekf import gate_and_fuse


class FrameResult(NamedTuple):
    est_pose: jnp.ndarray     # [3] NDT pose (deg)
    fused_pose: jnp.ndarray   # [3] fused pose (deg)
    cov: jnp.ndarray          # [3,3]
    cost: jnp.ndarray         # fitness (or failed_cost)
    successful: jnp.ndarray   # bool
    iterations: jnp.ndarray   # int32
    matched: jnp.ndarray      # float32
    global_xy: jnp.ndarray    # [N,2] scan in map frame at fused pose
    error_pose: jnp.ndarray   # [3] map->odom offset (deg), TF parity
    trans_probability: jnp.ndarray  # score per source point (PCL
    # getTransformationProbability analog, logged by the reference at
    # src/PoseEstimator.cpp:48-49; our objective E = -score sum)
    packed: jnp.ndarray       # [24] all small outputs in one array —
    # the pipelined frontend fetches K frames' results by stacking K of
    # these (K args) instead of K x 10 separate arrays (arg marshaling
    # over a remote-TPU tunnel scales with arg count; measured: depth
    # 32 resolves were 8x SLOWER than depth 8 before this field).
    # Layout: fused(3) cov(9) cost successful iters matched tprob
    # est(3) err(3) grid_ok — see pipeline/async_frontend._unpack_row.
    # grid_ok is 1.0 except when the incremental-grid window escaped
    # its moment lattice (the frontend then redoes the frame with the
    # full grid rebuild).
    grid_ok: jnp.ndarray      # scalar float, == packed[23]


@partial(jax.jit, static_argnames=("cfg",))
def _registration_step(
    cfg: SlamConfig,
    scan_xy: jnp.ndarray,      # [S,2] resampled scan, sensor frame
    scan_mask: jnp.ndarray,    # [S]
    odo_pose: jnp.ndarray,     # [3] current raw odometry (deg)
    prev_odo: jnp.ndarray,     # [3] previous raw odometry (deg)
    last_pose: jnp.ndarray,    # [3] last fused pose (deg)
    last_cov: jnp.ndarray,     # [3,3]
    local_xy: jnp.ndarray,     # [L,2] local map (map frame)
    local_mask: jnp.ndarray,   # [L]
) -> FrameResult:
    # --- odometry prediction (reference: src/ScanMatcher.cpp:27-32)
    odo_motion = pose2.cal_motion(odo_pose, prev_odo)
    pred_pose = pose2.cal_pred_pose(odo_motion, last_pose)

    # --- NDT grid over the local map, window centered on the prediction
    grid = build_grid(
        local_xy, local_mask, pred_pose[:2],
        cfg.grid_cells_x, cfg.grid_cells_y, cfg.ndt_resolution,
        min_pts=cfg.ndt_min_points_per_cell,
    )
    return _register_with_grid(
        cfg, grid, scan_xy, scan_mask, odo_pose, odo_motion, pred_pose,
        last_pose, last_cov, local_xy, local_mask,
        grid_ok=jnp.float32(1.0),
    )


@partial(jax.jit, static_argnames=("cfg", "include_newest"))
def _registration_step_inc(
    cfg: SlamConfig,
    scan_xy: jnp.ndarray,      # [S,2] resampled scan, sensor frame
    scan_mask: jnp.ndarray,    # [S]
    odo_pose: jnp.ndarray,     # [3]
    prev_odo: jnp.ndarray,     # [3]
    last_pose: jnp.ndarray,    # [3]
    last_cov: jnp.ndarray,     # [3,3]
    local_xy: jnp.ndarray,     # [L,2] target buffer (fitness NN pass)
    local_mask: jnp.ndarray,   # [L]
    mom: jnp.ndarray,          # [B*B,6] running moment lattice
    mom_anchor: jnp.ndarray,   # [2] int32 lattice anchor (abs cells)
    newest_xy: jnp.ndarray,    # [S,2] newest raw scan (map frame)
    newest_mask: jnp.ndarray,  # [S]
    proc_count: jnp.ndarray,   # int32 submap proc-buffer fill level
    include_newest: bool,
) -> FrameResult:
    """Registration against the INCREMENTAL moment lattice (VERDICT r4
    next-round #2): the NDT grid is a dynamic window slice of the
    running lattice plus the newest raw scan's fresh ~2k-point scatter,
    instead of a full rescatter of the [L]-point target buffer. The
    target buffer still feeds the fitness pass (reference semantics:
    getFitnessScore runs over target POINTS, src/PoseEstimator.cpp:42).
    `include_newest` mirrors Submap.step_flags: with remove_moving the
    newest raw scan rides along in cloud() and is not in the lattice.

    `proc_count` mirrors the target buffer's overflow policy: cloud()
    concatenates the newest scan into the cap_sub buffer AFTER proc,
    so once proc fills (routine mid-submap — ~32 scans at production
    capacities) the newest scan's tail is DROPPED from the target.
    The fresh moments must drop the same points or the two grids
    diverge materially in the second half of every submap (found as a
    2.7x ATE regression on the killian_robot fixture)."""
    from ndt_slam_tpu.ndt.grid import (
        lattice_anchor, moments_abs, window_grid_from_lattice,
    )

    odo_motion = pose2.cal_motion(odo_pose, prev_odo)
    pred_pose = pose2.cal_pred_pose(odo_motion, last_pose)

    B = cfg.resolved_grid_mom_cells
    nx, ny = cfg.grid_cells_x, cfg.grid_cells_y
    res = cfg.ndt_resolution
    frame_anchor = lattice_anchor(pred_pose[:2], nx, res)
    extra = None
    if include_newest:
        # keep only the newest points that fit the cap_sub buffer
        # after proc — _concat packs compacted valid points in order,
        # so validity-rank < remaining capacity is the exact rule
        rank = jnp.cumsum(newest_mask.astype(jnp.int32)) - 1
        budget = jnp.int32(cfg.max_submap_points) - proc_count
        nm = newest_mask & (rank < budget)
        extra = moments_abs(newest_xy, nm, frame_anchor, nx, ny, res)
    grid, in_range = window_grid_from_lattice(
        mom, mom_anchor, B, B, frame_anchor, nx, ny, res,
        extra=extra, min_pts=cfg.ndt_min_points_per_cell,
    )
    return _register_with_grid(
        cfg, grid, scan_xy, scan_mask, odo_pose, odo_motion, pred_pose,
        last_pose, last_cov, local_xy, local_mask,
        grid_ok=in_range.astype(jnp.float32),
    )


def _register_with_grid(
    cfg: SlamConfig, grid, scan_xy, scan_mask, odo_pose, odo_motion,
    pred_pose, last_pose, last_cov, local_xy, local_mask, grid_ok,
) -> FrameResult:
    """Shared registration tail: source downsample, align, fitness,
    gate+fuse, map-frame projection, packed-row assembly."""
    # --- source downsample (reference: src/PoseEstimator.cpp:6-10)
    src = voxel_filter(PointBuffer(scan_xy, scan_mask), cfg.source_leaf_size)

    use_pallas = cfg.resolved_ndt_engine == "pallas"
    if cfg.resolved_ndt_engine in ("compact", "pallas"):
        grid = compact_grid(grid, cfg.ndt_max_active_cells)
    d1, d2 = gauss_constants(cfg.ndt_resolution, cfg.ndt_outlier_ratio)

    init_rad = pose2.pose_deg_to_rad(pred_pose)
    res = align(
        init_rad, src.xy, src.mask, grid, d1, d2,
        max_iterations=cfg.ndt_max_iterations,
        step_size=cfg.ndt_step_size,
        trans_eps=cfg.ndt_trans_eps,
        radius=cfg.ndt_neighborhood,
        use_pallas=use_pallas,
    )
    est_pose = pose2.pose_rad_to_deg(res.pose_rad)

    # --- fitness at the converged pose (reference: getFitnessScore on
    #     the downsampled source, src/PoseEstimator.cpp:42-46)
    src_map = pose2.global_points(est_pose, src.xy)
    src_map = jnp.where(src.mask[:, None], src_map, PAD_COORD)
    if use_pallas:
        from ndt_slam_tpu.ndt.pallas_kernels import fitness_score_pallas
        fit = fitness_score_pallas(src_map, src.mask, local_xy, local_mask)
    else:
        fit = fitness_score(src_map, src.mask, local_xy, local_mask)
    cost = jnp.where(res.converged, fit, cfg.failed_cost)
    # --- covariance repair + fitness/innovation gates + Kalman fuse or
    #     dead-reckon (fuse/ekf.gate_and_fuse — single source of truth,
    #     shared with the multi-host sequential step)
    fused, cov, accept = gate_and_fuse(
        cfg, pred_pose, est_pose, res.hessian, cost,
        odo_motion, last_pose, last_cov,
    )

    # --- scan into map frame at the fused pose (growMap input,
    #     reference: src/ScanMatcher.cpp:93-109)
    g = pose2.global_points(fused, scan_xy)
    g = jnp.where(scan_mask[:, None], g, PAD_COORD)

    # --- TF map->odom parity (reference: src/ScanMatcher.cpp:82-84)
    error_pose = pose2.cal_global_motion(fused, odo_pose)

    n_src = jnp.sum(src.mask.astype(jnp.float32))
    trans_prob = -res.objective / jnp.maximum(n_src, 1.0)

    packed = jnp.concatenate([
        fused,
        cov.reshape(-1),
        jnp.stack([
            cost,
            accept.astype(jnp.float32),
            res.iterations.astype(jnp.float32),
            res.matched,
            trans_prob,
        ]),
        est_pose,
        error_pose,
        grid_ok[None],
    ])
    return FrameResult(
        est_pose=est_pose,
        fused_pose=fused,
        cov=cov,
        cost=cost,
        successful=accept,
        iterations=res.iterations,
        matched=res.matched,
        global_xy=g,
        error_pose=error_pose,
        trans_probability=trans_prob,
        packed=packed,
        grid_ok=grid_ok,
    )


class FrontEnd:
    """Host orchestration: reference FrontEnd::process + ScanMatcher
    (src/FrontEnd.cpp:4-48, src/ScanMatcher.cpp:4-117)."""

    def __init__(self, cfg: SlamConfig, mesh=None):
        self.cfg = cfg
        self.pcmap = PointCloudMap(cfg)
        self.cnt = 0
        self.prev_odo: Optional[np.ndarray] = None
        self.last_cov = jnp.zeros((3, 3), dtype=jnp.float32)
        # Device-resident carries: avoid re-uploading the last fused
        # pose / previous odometry every frame (each host->device
        # dispatch is a full round trip over a remote-TPU tunnel).
        self._last_pose_dev: Optional[jnp.ndarray] = None
        self._prev_odo_dev: Optional[jnp.ndarray] = None
        self.init_pose: Optional[np.ndarray] = None
        self.pose_history: list[np.ndarray] = []
        self.cov_history: list[np.ndarray] = []
        self.metrics: list[dict] = []
        # loop-closure cost accounting (BASELINE.md scale runs):
        # t_backend = detection/verification/optimization wall-time,
        # t_remake = map-rewrite wall-time after accepted corrections.
        self.t_backend = 0.0
        self.t_remake = 0.0
        self.n_corrections = 0
        # Lockstep batch mode: the batch runner defers each frame's
        # device map update and executes ONE vmapped program for all
        # sequences in the tick (batch_runner._flush_map_updates).
        self._defer_map = False
        self._pending_scan: Optional[PointBuffer] = None
        # incremental-grid escape hatch: route the NEXT dispatched
        # frame through the full grid rebuild (set when a frame's
        # window escaped the moment lattice; n_grid_fallbacks counts
        # occurrences — expected 0 with the auto-sized margin)
        self._force_full_grid = False
        self.n_grid_fallbacks = 0
        # set by _apply_correction: the map was rebuilt in place, so
        # any stack-resident copy of it (batch runner) is stale
        self._map_rewritten = False
        self.backend = None
        if cfg.loop_enable:
            from ndt_slam_tpu.graph.backend import GraphBackend
            self.backend = GraphBackend(cfg, mesh=mesh)

    def warmup(self):
        """Pre-compile every map-step program variant the run will hit
        (fused add-scan/target variants, submap-close voxel filter,
        post-close target fallback) so no XLA compile lands mid-run.
        The per-frame registration step still compiles on frame 1 —
        call this for latency-sensitive runs and fair benchmarks."""
        from ndt_slam_tpu.mapping.pointcloud_map import (
            _add_scan_and_target, _add_scan_target_mom, _append,
            _concat, _interior, _rebuild_mom, _voxel,
        )
        cfg = self.cfg
        scan = PointBuffer.empty(cfg.max_scan_points)
        proc = PointBuffer.empty(cfg.max_submap_points)
        zero = jnp.int32(0)
        common = dict(
            filtered=cfg.ndt_target_filtered,
            cap_sub=cfg.max_submap_points,
            cap_local=cfg.max_local_map_points,
            resol=cfg.diff_resol, thre=cfg.thre_neighbor,
            leaf=cfg.submap_leaf_size,
        )
        if cfg.remove_moving:
            variants = [(True, False, True), (False, False, True),
                        (False, True, True)]
        else:
            variants = [(True, False, False)]
        inc_grid = cfg.resolved_ndt_incremental_grid
        B = cfg.resolved_grid_mom_cells
        mom = jnp.zeros((B * B, 6), jnp.float32)
        mom_anchor = jnp.zeros((2,), jnp.int32)
        outs = []
        for has_prev in (False, True):
            pv = proc if has_prev else PointBuffer.empty(1)
            for ap, di, inc in variants:
                if inc_grid:
                    outs.append(_add_scan_target_mom(
                        proc, zero, scan, scan, scan, pv, mom,
                        mom_anchor,
                        append_scan=ap, do_interior=di,
                        include_newest=inc, has_prev=has_prev,
                        mom_cells=B, grid_res=cfg.ndt_resolution,
                        **common,
                    ))
                else:
                    outs.append(_add_scan_and_target(
                        proc, zero, scan, scan, scan, pv,
                        append_scan=ap, do_interior=di,
                        include_newest=inc, has_prev=has_prev,
                        **common,
                    ))
        if inc_grid:
            for has_prev in (False, True):
                pv = proc if has_prev else PointBuffer.empty(1)
                outs.append(_rebuild_mom(
                    pv, proc, mom_anchor, mom_cells=B,
                    grid_res=cfg.ndt_resolution, has_prev=has_prev,
                ))
        # submap close + post-close unfused target fallback
        c = _concat(proc, scan, cfg.max_submap_points)
        outs.append(_voxel(c, cfg.submap_leaf_size))
        outs.append(_concat(proc, c, cfg.max_local_map_points))
        outs.append(_concat(c, PointBuffer.empty(1),
                            cfg.max_local_map_points))
        # new-submap seeding path (Submap.add_scan, unfused): the
        # standalone _append, and the standalone _interior when
        # remove_moving — first exercised at the first submap close.
        outs.append(_append(proc, zero, scan))
        if cfg.remove_moving:
            outs.append(_interior(scan, scan, scan,
                                  cfg.diff_resol, cfg.thre_neighbor))
        jax.block_until_ready(outs)

    def process(self, scan_xy_local: np.ndarray, odo_pose_deg: np.ndarray,
                sid: Optional[int] = None) -> dict:
        """One frame. scan_xy_local: [n,2] raw sensor-frame points;
        odo_pose_deg: [3] raw odometry. Returns the per-frame metrics."""
        cfg = self.cfg
        if sid is None:
            sid = self.cnt
        if sid < cfg.start_frame:
            return {"sid": sid, "skipped": True}

        from ndt_slam_tpu.io.native import resample_points
        rs = resample_points(
            scan_xy_local, cfg.resample_space, cfg.resample_space_thre
        )
        scan = pad_points(rs, cfg.max_scan_points)
        odo = np.asarray(odo_pose_deg, dtype=np.float32)

        if self.cnt == 0:
            # bootstrap (reference: src/ScanMatcher.cpp:9-22)
            self.init_pose = odo.copy()
            fused = odo
            cov = np.zeros((3, 3), dtype=np.float32)
            g = pose2.global_points(jnp.asarray(fused), scan.xy)
            g = jnp.where(scan.mask[:, None], g, PAD_COORD)
            self._grow_map(PointBuffer(g, scan.mask), fused, rs,
                           scan_local_padded=scan)
            self.last_cov = jnp.asarray(cov)
            self.prev_odo = odo
            self._last_pose_dev = jnp.asarray(fused)
            self._prev_odo_dev = jnp.asarray(odo)
            self.cnt += 1
            rec = {
                "sid": sid, "cost": 0.0, "successful": True,
                "fused_pose": fused.tolist(), "iterations": 0,
                "bootstrap": True,
            }
            self._record(fused, cov, rec)
            if self.backend is not None:
                self.backend.add_frame(sid, fused, cov, scan)
            return rec

        (odo_dev, prev_odo_dev, last_pose_dev, local) = (
            self._frame_inputs(odo)
        )
        out = self._run_step(scan, odo_dev, prev_odo_dev,
                             last_pose_dev, local)
        # One batched transfer for every small per-frame output (a
        # field-by-field np.asarray costs one device round trip EACH).
        host_vals = jax.device_get((
            out.fused_pose, out.cov, out.cost, out.successful,
            out.est_pose, out.iterations, out.matched,
            out.error_pose, out.trans_probability, out.grid_ok,
        ))
        if not host_vals[9] > 0.0:
            # incremental-grid window escaped its lattice: redo this
            # frame through the full rebuild (loud fallback; the
            # auto-sized margin makes this unreachable in normal runs)
            self.n_grid_fallbacks += 1
            self._force_full_grid = True
            out = self._run_step(scan, odo_dev, prev_odo_dev,
                                 last_pose_dev, local)
            host_vals = jax.device_get((
                out.fused_pose, out.cov, out.cost, out.successful,
                out.est_pose, out.iterations, out.matched,
                out.error_pose, out.trans_probability, out.grid_ok,
            ))
        return self._finish_frame(out, host_vals[:9], scan, rs, odo,
                                  odo_dev, sid)

    def _run_step(self, scan: PointBuffer, odo_dev, prev_odo_dev,
                  last_pose_dev, local: PointBuffer) -> FrameResult:
        """Dispatch the per-frame device step. The multi-host runner
        (pipeline/dist_runner.DistFrontEnd) overrides this to run the
        registration sharded over the global device set.

        With cfg.ndt_incremental_grid the NDT grid comes from the
        running moment lattice (window slice + newest-scan scatter)
        instead of a full rescatter of the target buffer; the
        `_force_full_grid` escape hatch (set when a frame's window
        escaped the lattice — see FrameResult.grid_ok) routes ONE
        frame back through the full rebuild."""
        cfg = self.cfg
        if (cfg.resolved_ndt_incremental_grid and not self._defer_map
                and not self._force_full_grid):
            mom, anchor = self.pcmap.mom_state()
            newest = self.pcmap.newest_raw()
            include_newest = bool(cfg.remove_moving
                                  and newest is not None)
            if newest is None:
                newest = scan  # unused (include_newest False)
            return _registration_step_inc(
                cfg, scan.xy, scan.mask,
                odo_dev, prev_odo_dev, last_pose_dev, self.last_cov,
                local.xy, local.mask, mom, anchor,
                newest.xy, newest.mask,
                self.pcmap.submaps[-1].proc_count, include_newest,
            )
        self._force_full_grid = False
        return _registration_step(
            self.cfg, scan.xy, scan.mask,
            odo_dev, prev_odo_dev, last_pose_dev, self.last_cov,
            local.xy, local.mask,
        )

    def _frame_inputs(self, odo: np.ndarray, local_override=None):
        """Device-side inputs of the registration step (everything but
        the scan): (odo_dev, prev_odo_dev, last_pose_dev, local_map).
        Shared by the sequential path and the lockstep batch runner
        (which passes its stack-resident target as `local_override`)."""
        local = (local_override if local_override is not None
                 else self.pcmap.registration_target())
        odo_dev = jnp.asarray(odo)
        prev_odo_dev = (
            self._prev_odo_dev if self._prev_odo_dev is not None
            else jnp.asarray(self.prev_odo)
        )
        last_pose_dev = (
            self._last_pose_dev if self._last_pose_dev is not None
            else jnp.asarray(self.pcmap.get_last_pose())
        )
        return odo_dev, prev_odo_dev, last_pose_dev, local

    def _finish_frame(self, out: Optional[FrameResult], host_vals,
                      scan: PointBuffer, rs_local: np.ndarray,
                      odo: np.ndarray, odo_dev, sid: int,
                      pending=None) -> dict:
        """Post-registration bookkeeping: carries, map growth, metrics,
        loop-closure backend. `host_vals` is the fetched tuple
        (fused, cov, cost, successful, est, iters, matched, err, tprob)
        — the batch runner fetches it for ALL sequences in one transfer
        before calling this per sequence.

        Batch mode (`_defer_map`): every per-slot device op here would
        cost ~1 ms of tunnel enqueue x 8 slots x N fields, so the
        carries are kept HOST-side (rebuilt into [B,...] device inputs
        once per tick by the runner), `out` may be None, and the
        deferred map update is the runner-supplied `pending` sentinel
        (resolved against the tick's stacked outputs in
        batch_runner._flush_map_updates)."""
        cfg = self.cfg
        fused, cov, cost, successful, est, iters, matched, err, tprob = (
            host_vals
        )
        if self._defer_map:
            self.last_cov = np.asarray(cov)
            self._last_pose_dev = None
            self._prev_odo_dev = None
            gbuf = pending
        else:
            self.last_cov = out.cov
            self._last_pose_dev = out.fused_pose
            self._prev_odo_dev = odo_dev
            gbuf = PointBuffer(out.global_xy, scan.mask)
        self._grow_map(gbuf, fused, rs_local,
                       scan_local_padded=(scan if not self._defer_map
                                          else None))
        self.prev_odo = odo
        self.cnt += 1
        rec = self._build_rec(sid, host_vals)
        self._record(fused, cov, rec)
        self._backend_hook(sid, fused, cov, scan, rec)
        return rec

    @staticmethod
    def _build_rec(sid: int, host_vals) -> dict:
        """Per-frame metrics record from the fetched small outputs —
        shared by the synchronous path and the pipelined resolver
        (async_frontend._complete_fetch) so the record schema cannot
        drift between them."""
        fused, cov, cost, successful, est, iters, matched, err, tprob = (
            host_vals
        )
        return {
            "sid": sid,
            "cost": float(cost),
            "successful": bool(successful),
            "est_pose": np.asarray(est).tolist(),
            "fused_pose": np.asarray(fused).tolist(),
            "iterations": int(iters),
            "matched": float(matched),
            "error_pose": np.asarray(err).tolist(),
            "trans_probability": float(tprob),
        }

    def _backend_hook(self, sid: int, fused, cov, scan: PointBuffer,
                      rec: dict) -> bool:
        """Pose-graph backend step for one resolved frame: add_frame,
        scheduled try_close, correction application + timing. Shared by
        the synchronous path and the pipelined resolver. Returns True
        when a correction rewrote the map (the pipelined resolver must
        then replay its in-flight tail)."""
        if self.backend is None:
            return False
        import time as _time
        self.backend.add_frame(sid, fused, cov, scan)
        if (self.cnt - 1) % max(1, self.cfg.loop_check_skip) == 0:
            t0 = _time.perf_counter()
            corrected = self.backend.try_close(sid, fused, scan)
            self.t_backend += _time.perf_counter() - t0
            if corrected is not None:
                t1 = _time.perf_counter()
                self._apply_correction(corrected)
                self.t_remake += _time.perf_counter() - t1
                self.n_corrections += 1
                rec["loop_closed"] = True
                return True
        return False

    def finalize(self):
        """End-of-run hook: apply any loop-closure correction the
        deferred optimizer (cfg.loop_opt_min_frames) is still holding."""
        if self.backend is None:
            return
        import time as _time
        t0 = _time.perf_counter()
        corrected = self.backend.flush()
        self.t_backend += _time.perf_counter() - t0
        if corrected is not None:
            t1 = _time.perf_counter()
            self._apply_correction(corrected)
            self.t_remake += _time.perf_counter() - t1
            self.n_corrections += 1

    def _apply_correction(self, corrected_deg: np.ndarray):
        """Rewrite trajectory + map through pose-graph-corrected poses
        (reference: the disabled remakePoseArray/remakeMaps path,
        src/ScanMatcher.h:83-101, src/PointCloudMap.cpp:136-171)."""
        n = len(self.pose_history)
        assert corrected_deg.shape[0] == n, (corrected_deg.shape, n)
        self.pose_history = [
            corrected_deg[i].astype(np.float32) for i in range(n)
        ]
        self.pcmap.remake_maps(corrected_deg)
        # the device-resident carry is stale after a rewrite; a pending
        # deferred map update is superseded (the rebuild replays every
        # recorded scan, including this frame's)
        self._last_pose_dev = None
        self._pending_scan = None
        self._map_rewritten = True

    # reference: ScanMatcher::growMap (src/ScanMatcher.cpp:93-117)
    def _grow_map(self, scan_map_frame: PointBuffer, fused_pose, rs_local,
                  scan_local_padded: Optional[PointBuffer] = None):
        self.pcmap.add_pose(fused_pose)
        if self._defer_map:
            # batch mode: the runner executes all sequences' map
            # updates as one vmapped program after the tick
            self._pending_scan = scan_map_frame
        else:
            # make_target: one fused device program for the map update
            # that also leaves the next frame's registration target
            # cached — the sequential pipeline's dispatch count per
            # frame drops from ~6 to 3 (registration, map step,
            # metrics fetch).
            self.pcmap.add_points(scan_map_frame, make_target=True)
        self.pcmap.set_last_pose(fused_pose)
        if isinstance(scan_map_frame, PointBuffer):
            self.pcmap.set_last_scan(scan_map_frame)
        # else: batch-mode ("slot", i) sentinel — the real map-frame
        # buffer is restored by BatchFrontEnd._dump_slot (from the
        # stacked raw tail) before any checkpoint/finalize consumer
        # reads pcmap.last_scan.
        self.pcmap.record_local_scan(rs_local, padded=scan_local_padded)

    def _record(self, fused, cov, rec):
        self.pose_history.append(np.asarray(fused))
        self.cov_history.append(np.asarray(cov))
        self.metrics.append(rec)

    def get_poses(self) -> np.ndarray:
        return np.asarray(self.pose_history, dtype=np.float32)
