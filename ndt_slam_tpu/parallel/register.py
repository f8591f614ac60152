"""Sharded NDT registration: the multi-chip compute path.

The reference runs registration single-threaded on one CPU core
(SURVEY.md §2.3). Here the same per-frame math is expressed once as an
SPMD program over a `jax.sharding.Mesh`:

- Point buffers (registration target and source) are sharded along the
  "pt" mesh axis. The NDT grid build becomes: each device scatters its
  target shard into per-cell partial moments, one `psum` merges them,
  and every device finalizes an identical grid (ndt/grid.py split).
- The Newton solve runs in lockstep: per-device partial score / grad /
  Hessian / line-search reductions are psum'd (ndt/solve.py axis_name),
  so all devices apply the same step every iteration.
- Fitness all_gathers the target shard once and psums the per-shard
  partial sums (ndt/fitness.py sharded="both").
- Independent scan pairs (loop-closure candidate verification, batch
  evaluation) additionally shard along the "dp" axis.

All collectives are XLA named collectives over ICI — there is no
host-side communication anywhere in the step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core import pose2
from ndt_slam_tpu.core.points import PAD_COORD
from ndt_slam_tpu.fuse.ekf import gate_and_fuse
from ndt_slam_tpu.ndt.fitness import fitness_score
from ndt_slam_tpu.ndt.compact import compact_grid
from ndt_slam_tpu.ndt.grid import grid_finalize, grid_moments, grid_origin
from ndt_slam_tpu.ndt.score import gauss_constants
from ndt_slam_tpu.ndt.solve import align


class RegisterOut(NamedTuple):
    pose_rad: jnp.ndarray    # [3] (or [B,3]) converged pose
    cost: jnp.ndarray        # fitness (failed_cost when unusable)
    converged: jnp.ndarray   # bool
    iterations: jnp.ndarray  # int32
    matched: jnp.ndarray     # float32
    hessian: jnp.ndarray     # [3,3] objective Hessian at the optimum


def _register_core(
    cfg: SlamConfig,
    axis: str | None,
    src_xy, src_mask, tgt_xy, tgt_mask, init_pose_rad, center,
) -> RegisterOut:
    """One NDT registration (sharded over `axis` when set).

    Mirrors pipeline/frontend._registration_step's registration slice;
    reference call stack: src/PoseEstimator.cpp:4-69 (SURVEY.md §3.3).
    """
    nx, ny, res = cfg.grid_cells_x, cfg.grid_cells_y, cfg.ndt_resolution
    origin = grid_origin(center, nx, ny, res)
    mom = grid_moments(tgt_xy, tgt_mask, origin, nx, ny, res)
    if axis is not None:
        mom = tuple(jax.lax.psum(m, axis) for m in mom)
    grid = grid_finalize(
        mom, origin, nx, ny, res, min_pts=cfg.ndt_min_points_per_cell
    )
    if cfg.resolved_ndt_engine in ("compact", "pallas"):
        # identical (post-psum) grid on every device -> identical table
        grid = compact_grid(grid, cfg.ndt_max_active_cells)
    d1, d2 = gauss_constants(cfg.ndt_resolution, cfg.ndt_outlier_ratio)

    r = align(
        init_pose_rad, src_xy, src_mask, grid, d1, d2,
        max_iterations=cfg.ndt_max_iterations,
        step_size=cfg.ndt_step_size,
        trans_eps=cfg.ndt_trans_eps,
        radius=cfg.ndt_neighborhood,
        axis_name=axis,
        use_pallas=cfg.resolved_ndt_engine == "pallas",
    )

    pose_deg = pose2.pose_rad_to_deg(r.pose_rad)
    src_map = pose2.global_points(pose_deg, src_xy)
    src_map = jnp.where(src_mask[:, None], src_map, PAD_COORD)
    fit = fitness_score(
        src_map, src_mask, tgt_xy, tgt_mask,
        axis_name=axis, sharded="both",
    )
    cost = jnp.where(r.converged, fit, cfg.failed_cost)
    return RegisterOut(
        pose_rad=r.pose_rad,
        cost=cost,
        converged=r.converged,
        iterations=r.iterations,
        matched=r.matched,
        hessian=r.hessian,
    )


def make_sharded_register(mesh: Mesh, cfg: SlamConfig, axis: str = "pt"):
    """Single-pair registration with point buffers sharded over `axis`.

    Returns a jitted fn(src_xy, src_mask, tgt_xy, tgt_mask,
    init_pose_rad, center) -> RegisterOut with replicated outputs.
    Buffer capacities must divide the axis size.
    """
    pt = P(axis)
    rep = P()
    core = partial(_register_core, cfg, axis)
    fn = jax.jit(
        jax.shard_map(
            core,
            mesh=mesh,
            in_specs=(pt, pt, pt, pt, rep, rep),
            out_specs=RegisterOut(rep, rep, rep, rep, rep, rep),
            # Pallas interpret mode (the CPU test path) builds internal
            # while_loops that mix invariant counters with varying
            # carries, which the vma typer rejects; numerics are
            # unaffected (parity-tested). Mosaic-compiled TPU kernels
            # type fine either way.
            check_vma=cfg.resolved_ndt_engine != "pallas",
        )
    )
    return fn


def make_batch_register(
    mesh: Mesh, cfg: SlamConfig,
    axis_batch: str = "dp", axis_points: str = "pt",
):
    """Batched pair registration: pairs sharded over `axis_batch`, each
    pair's points sharded over `axis_points` — the loop-closure
    candidate-verification workload (SURVEY.md §7.2 step 6), which is
    embarrassingly parallel across pairs.

    Returns a jitted fn(src_xy[B,N,2], src_mask[B,N], tgt_xy[B,M,2],
    tgt_mask[B,M], init_pose_rad[B,3], center[B,2]) -> RegisterOut with
    leading batch dim, replicated along the point axis.
    """
    bp = P(axis_batch, axis_points)
    bm = P(axis_batch, axis_points)
    brep = P(axis_batch)
    core = jax.vmap(partial(_register_core, cfg, axis_points))
    fn = jax.jit(
        jax.shard_map(
            core,
            mesh=mesh,
            in_specs=(bp, bm, bp, bm, brep, brep),
            out_specs=RegisterOut(brep, brep, brep, brep, brep, brep),
            check_vma=cfg.resolved_ndt_engine != "pallas",  # see make_sharded_register
        )
    )
    return fn


class SeqStepOut(NamedTuple):
    """Replicated outputs of the multi-host sequential frame step —
    field-compatible with pipeline/frontend.FrameResult: global_xy is
    the RAW scan in the map frame at the fused pose, and packed is the
    [24] row the pipelined resolver fetches in chunks."""
    est_pose: jnp.ndarray
    fused_pose: jnp.ndarray
    cov: jnp.ndarray
    cost: jnp.ndarray
    successful: jnp.ndarray
    iterations: jnp.ndarray
    matched: jnp.ndarray
    error_pose: jnp.ndarray
    trans_probability: jnp.ndarray
    global_xy: jnp.ndarray
    packed: jnp.ndarray


def make_sharded_sequential_step(mesh: Mesh, cfg: SlamConfig,
                                 axis: str = "pt"):
    """ONE frame of the sequential SLAM loop with the point buffers
    (voxel-filtered source + registration target) sharded over `axis`
    of a GLOBAL device mesh — the multi-host execution of
    pipeline/frontend._registration_step (minus the source voxel
    filter, which the caller runs replicated first). The accept/fuse
    tail is fuse/ekf.gate_and_fuse — shared with the single-device
    step, so the two cannot drift. The map-frame scan projection and
    the packed output row are computed IN-PROGRAM (replicated) so the
    pipelined multi-host runner needs no per-frame host sync
    (VERDICT r4 next-round #4).

    Returns a jitted fn(src_xy, src_mask, odo, prev_odo, last_pose,
    last_cov, tgt_xy, tgt_mask, scan_xy, scan_mask) -> SeqStepOut
    (all outputs replicated; scan_xy/mask is the raw padded scan,
    replicated). Buffer capacities must divide the axis size.
    """
    nx, ny, res = cfg.grid_cells_x, cfg.grid_cells_y, cfg.ndt_resolution

    def body(src_xy, src_mask, odo, prev_odo, last_pose, last_cov,
             tgt_xy, tgt_mask, scan_xy, scan_mask):
        odo_motion = pose2.cal_motion(odo, prev_odo)
        pred_pose = pose2.cal_pred_pose(odo_motion, last_pose)
        init_rad = pose2.pose_deg_to_rad(pred_pose)

        origin = grid_origin(pred_pose[:2], nx, ny, res)
        mom = grid_moments(tgt_xy, tgt_mask, origin, nx, ny, res)
        mom = tuple(jax.lax.psum(m, axis) for m in mom)
        grid = grid_finalize(
            mom, origin, nx, ny, res, min_pts=cfg.ndt_min_points_per_cell
        )
        if cfg.resolved_ndt_engine in ("compact", "pallas"):
            grid = compact_grid(grid, cfg.ndt_max_active_cells)
        d1, d2 = gauss_constants(cfg.ndt_resolution, cfg.ndt_outlier_ratio)
        r = align(
            init_rad, src_xy, src_mask, grid, d1, d2,
            max_iterations=cfg.ndt_max_iterations,
            step_size=cfg.ndt_step_size,
            trans_eps=cfg.ndt_trans_eps,
            radius=cfg.ndt_neighborhood,
            axis_name=axis,
            use_pallas=cfg.resolved_ndt_engine == "pallas",
        )
        est_pose = pose2.pose_rad_to_deg(r.pose_rad)

        src_map = pose2.global_points(est_pose, src_xy)
        src_map = jnp.where(src_mask[:, None], src_map, PAD_COORD)
        fit = fitness_score(
            src_map, src_mask, tgt_xy, tgt_mask,
            axis_name=axis, sharded="both",
        )
        cost = jnp.where(r.converged, fit, cfg.failed_cost)

        fused, cov, accept = gate_and_fuse(
            cfg, pred_pose, est_pose, r.hessian, cost,
            odo_motion, last_pose, last_cov,
        )
        error_pose = pose2.cal_global_motion(fused, odo)
        n_src = jax.lax.psum(
            jnp.sum(src_mask.astype(jnp.float32)), axis
        )
        tprob = -r.objective / jnp.maximum(n_src, 1.0)
        g = pose2.global_points(fused, scan_xy)
        g = jnp.where(scan_mask[:, None], g, PAD_COORD)
        packed = jnp.concatenate([
            fused,
            cov.reshape(-1),
            jnp.stack([
                cost,
                accept.astype(jnp.float32),
                r.iterations.astype(jnp.float32),
                r.matched,
                tprob,
            ]),
            est_pose,
            error_pose,
            jnp.ones((1,), jnp.float32),  # grid_ok: full rebuild path
        ])
        return SeqStepOut(
            est_pose=est_pose, fused_pose=fused, cov=cov, cost=cost,
            successful=accept, iterations=r.iterations,
            matched=r.matched, error_pose=error_pose,
            trans_probability=tprob, global_xy=g, packed=packed,
        )

    pt = P(axis)
    rep = P()
    return jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(pt, pt, rep, rep, rep, rep, pt, pt, rep, rep),
            out_specs=SeqStepOut(*([rep] * 11)),
            check_vma=cfg.resolved_ndt_engine != "pallas",
        )
    )


class FrameStepOut(NamedTuple):
    est_pose: jnp.ndarray    # [B,3] NDT pose (deg)
    fused_pose: jnp.ndarray  # [B,3] Kalman-fused pose (deg)
    cov: jnp.ndarray         # [B,3,3]
    cost: jnp.ndarray        # [B]
    successful: jnp.ndarray  # [B] bool
    iterations: jnp.ndarray  # [B]


def make_sharded_frame_step(
    mesh: Mesh, cfg: SlamConfig,
    axis_batch: str = "dp", axis_points: str = "pt",
):
    """The FULL per-frame SLAM step, batched and sharded: odometry
    prediction -> sharded NDT registration -> fitness accept/reject ->
    NDT covariance from the Hessian -> Kalman fusion (reference
    pipeline SURVEY.md §3.2-3.3), for a batch of independent frames.

    dp shards the frame batch, pt shards every point buffer. This is
    the function `__graft_entry__.dryrun_multichip` compiles.
    """
    def frame_core(src_xy, src_mask, tgt_xy, tgt_mask,
                   odo_pose, prev_odo, last_pose, last_cov):
        odo_motion = pose2.cal_motion(odo_pose, prev_odo)
        pred_pose = pose2.cal_pred_pose(odo_motion, last_pose)
        init_rad = pose2.pose_deg_to_rad(pred_pose)
        r = _register_core(
            cfg, axis_points,
            src_xy, src_mask, tgt_xy, tgt_mask, init_rad, pred_pose[:2],
        )
        est_pose = pose2.pose_rad_to_deg(r.pose_rad)
        # Production accept/fuse tail — the same gate_and_fuse the
        # single-device step and the multi-host sequential step use, so
        # the dryrun-validated numerics ARE the production numerics
        # (reference accept/reject semantics: src/ScanMatcher.cpp:50-66).
        fused, cov, successful = gate_and_fuse(
            cfg, pred_pose, est_pose, r.hessian, r.cost,
            odo_motion, last_pose, last_cov,
        )
        return FrameStepOut(
            est_pose=est_pose, fused_pose=fused, cov=cov,
            cost=r.cost, successful=successful, iterations=r.iterations,
        )

    bp = P(axis_batch, axis_points)
    brep = P(axis_batch)
    fn = jax.jit(
        jax.shard_map(
            jax.vmap(frame_core),
            mesh=mesh,
            in_specs=(bp, bp, bp, bp, brep, brep, brep, brep),
            out_specs=FrameStepOut(brep, brep, brep, brep, brep, brep),
            check_vma=cfg.resolved_ndt_engine != "pallas",  # see make_sharded_register
        )
    )
    return fn
