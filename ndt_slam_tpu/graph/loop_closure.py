"""Loop-closure candidate verification: batched coarse-to-fine NDT.

The reference's LoopDetector exists only as commented-out scaffolding
(reference: src/FrontEnd.cpp:21-44; SURVEY.md §0). Design here:

- A candidate = (old keyframe scan, current scan, initial relative pose
  from the current trajectory estimate). Verification = NDT-register
  current against old; accept iff fitness <= loop_score_thre.
- Loop-closure initial errors are far larger than odometry-prediction
  errors, outside plain NDT's basin (~1 cell). So registration is
  COARSE-TO-FINE: first a grid at `coarse_mult` x resolution (wide,
  smooth basin, big steps), then the standard grid refines. Same
  physical window both stages.
- All candidates verify in one batched (vmapped) program — the
  embarrassingly parallel fan-out that motivates batched/dp execution
  on TPU (SURVEY.md §2.3); shard the batch axis via
  parallel.make_batch_register for multi-chip.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core import pose2
from ndt_slam_tpu.core.points import PAD_COORD
from ndt_slam_tpu.ndt.icp import icp_refine
from ndt_slam_tpu.ndt.compact import compact_grid
from ndt_slam_tpu.ndt.grid import build_grid
from ndt_slam_tpu.ndt.score import gauss_constants
from ndt_slam_tpu.ndt.solve import align


class LoopVerifyOut(NamedTuple):
    rel_pose_rad: jnp.ndarray  # [B,3] measured relative pose (old -> cur)
    cost: jnp.ndarray          # [B] trimmed mean NN d^2 over matched pts
    overlap: jnp.ndarray       # [B] matched-source fraction
    overlap_tgt: jnp.ndarray   # [B] matched-TARGET fraction (symmetric gate)
    accepted: jnp.ndarray      # [B] overlap & cost gates & converged
    hessian: jnp.ndarray       # [B,3,3] information of the fine stage


def _verify_one(cfg: SlamConfig, src_xy, src_mask, tgt_xy, tgt_mask,
                init_rel_rad):
    """Register src (current scan, its own frame) against tgt (old
    keyframe scan, old frame); init_rel_rad = initial guess of the
    old->cur relative pose."""
    nx, ny = cfg.grid_cells_x, cfg.grid_cells_y
    res = cfg.ndt_resolution
    center = init_rel_rad[:2]

    # Resolution ladder (e.g. 4x -> 2x -> 1x): each stage's basin must
    # contain the previous stage's residual error; jumping straight
    # from metres of initial error to the fine grid's ~1-cell basin
    # fails (fine NDT cells from cm-noise scans are sharp).
    pose = init_rel_rad
    rf = None
    for si, mult in enumerate(cfg.loop_stage_mults):
        nxs, nys = max(16, nx // mult), max(16, ny // mult)
        gs = build_grid(
            tgt_xy, tgt_mask, center, nxs, nys, res * mult,
            min_pts=cfg.ndt_min_points_per_cell,
        )
        if cfg.resolved_ndt_engine in ("compact", "pallas"):
            gs = compact_grid(gs, cfg.ndt_max_active_cells)
        d1s, d2s = gauss_constants(res * mult, cfg.ndt_outlier_ratio)

        def run_align(p, _gs=gs, _d1=d1s, _d2=d2s, _mult=mult):
            return align(
                p, src_xy, src_mask, _gs, _d1, _d2,
                max_iterations=(cfg.loop_stage_max_iterations
                                or cfg.ndt_max_iterations),
                step_size=cfg.ndt_step_size * _mult,
                trans_eps=cfg.ndt_trans_eps * min(_mult, 2),
                radius=cfg.ndt_neighborhood,
                use_pallas=cfg.resolved_ndt_engine == "pallas",
            )

        if si == 0 and cfg.loop_coarse_starts > 1:
            # MULTI-START at the coarse stage: the coarse grid's
            # cell-quantized landscape develops local minima roughly
            # half a cell from the optimum (measured: verifications
            # stalled at 0.6-1.2 m initial offsets with 1.2 m coarse
            # cells, retaining their full initial error while passing
            # the cost gate). A plus-pattern of half-cell-offset
            # starts, all scored in one vmapped pass, picks the basin
            # the single start misses.
            h = res * mult * 0.5
            offs = np.array(
                [[0.0, 0.0, 0.0], [h, 0.0, 0.0], [-h, 0.0, 0.0],
                 [0.0, h, 0.0], [0.0, -h, 0.0],
                 [h, h, 0.0], [-h, -h, 0.0], [h, -h, 0.0],
                 [-h, h, 0.0]][: cfg.loop_coarse_starts],
                np.float32,
            )
            starts = pose[None, :] + jnp.asarray(offs)
            rs = jax.vmap(run_align)(starts)
            # lower objective = better match; unusable starts ranked last
            score = jnp.where(rs.converged, rs.objective, jnp.inf)
            best = jnp.argmin(score)
            rf = jax.tree.map(lambda a: a[best], rs)
        else:
            rf = run_align(pose)
        pose = rf.pose_rad

    # Precision finisher: trimmed point-to-point ICP (ndt/icp.py). The
    # NDT ladder's fine optimum can sit a fraction of a cell off for
    # sparse single-scan targets; ICP converges to the unbiased metric
    # alignment and yields the overlap/error gate quantities directly.
    icp = icp_refine(
        pose, src_xy, src_mask, tgt_xy, tgt_mask,
        match_dist=cfg.loop_match_dist, iterations=10,
    )
    overlap = icp.matched_frac

    # Symmetric consistency: the TARGET's points must also be explained
    # by the transformed source. The one-sided gate misses the mirror
    # failure (extra structure in the keyframe that the current scan
    # lacks entirely); requiring both directions makes the accept
    # decision invariant to which scan carries the extra structure.
    from ndt_slam_tpu.ndt.fitness import nn_sq_dists

    pose_deg = pose2.pose_rad_to_deg(icp.pose_rad)
    src_map = pose2.global_points(pose_deg, src_xy)
    src_map = jnp.where(src_mask[:, None], src_map, PAD_COORD)
    d2_t = nn_sq_dists(tgt_xy, tgt_mask, src_map, src_mask)
    n_t = jnp.maximum(jnp.sum(tgt_mask.astype(jnp.float32)), 1.0)
    hit_t = tgt_mask & (d2_t <= cfg.loop_match_dist ** 2)
    overlap_tgt = jnp.sum(hit_t.astype(jnp.float32)) / n_t

    cost = jnp.where(rf.converged, icp.mean_sq_err, cfg.failed_cost)
    accepted = (
        rf.converged
        & (overlap >= cfg.loop_min_overlap)
        & (overlap_tgt >= cfg.loop_min_overlap)
        & (cost <= cfg.loop_score_thre)
    )
    return LoopVerifyOut(
        rel_pose_rad=icp.pose_rad, cost=cost, overlap=overlap,
        overlap_tgt=overlap_tgt, accepted=accepted, hessian=rf.hessian,
    )


@jax.jit
def pack_verify_out(out: LoopVerifyOut) -> jnp.ndarray:
    """LoopVerifyOut -> ONE [B,16] f32 array so the backend fetches a
    verification's results in a single device->host transfer. The old
    per-field/per-edge np.asarray slicing cost ~5 round trips per
    accepted edge over a remote-TPU tunnel — at killian scale (624
    edges) that was most of the unattributed backend wall time
    (VERDICT r3 missing #3). Layout (unpack_verify_row): rel(3) cost
    overlap overlap_tgt accepted hessian(9)."""
    return jnp.concatenate([
        out.rel_pose_rad,
        out.cost[:, None],
        out.overlap[:, None],
        out.overlap_tgt[:, None],
        out.accepted.astype(jnp.float32)[:, None],
        out.hessian.reshape(-1, 9),
    ], axis=1)


def unpack_verify_row(row: np.ndarray):
    """[16] packed row -> (rel_pose_rad[3], cost, overlap, overlap_tgt,
    accepted, hessian[3,3]) host values."""
    return (
        row[0:3].astype(np.float32),
        float(row[3]),
        float(row[4]),
        float(row[5]),
        bool(row[6] == 1.0),
        row[7:16].reshape(3, 3).astype(np.float64),
    )


def make_sharded_verify(mesh, cfg: SlamConfig, axis_batch: str = "dp"):
    """Candidate verification with the batch sharded over `axis_batch`
    of `mesh` — the multi-chip loop-closure fan-out (SURVEY.md §2.3:
    candidate matches batched across chips). The current scan is
    replicated; each device verifies its candidate shard independently
    (no collectives — the workload is embarrassingly parallel).

    Returns fn(src_xy[S,2], src_mask[S], tgt_xy[B,T,2], tgt_mask[B,T],
    init_rel_rad[B,3]) -> LoopVerifyOut; B must divide by the axis size
    (pad with masked candidates).
    """
    from jax.sharding import PartitionSpec as P

    bp = P(axis_batch)
    rep = P()
    one = partial(_verify_one, cfg)
    return jax.jit(
        jax.shard_map(
            jax.vmap(one, in_axes=(None, None, 0, 0, 0)),
            mesh=mesh,
            in_specs=(rep, rep, bp, bp, bp),
            out_specs=LoopVerifyOut(bp, bp, bp, bp, bp, bp),
            # see parallel/register.make_sharded_register
            check_vma=cfg.resolved_ndt_engine != "pallas",
        )
    )


@partial(jax.jit, static_argnames=("cfg",))
def verify_candidates(
    cfg: SlamConfig,
    src_xy: jnp.ndarray,     # [S,2] current scan (local frame)
    src_mask: jnp.ndarray,   # [S]
    tgt_xy: jnp.ndarray,     # [B,T,2] candidate keyframe scans
    tgt_mask: jnp.ndarray,   # [B,T]
    init_rel_rad: jnp.ndarray,  # [B,3]
) -> LoopVerifyOut:
    """Batched coarse-to-fine verification of B candidates."""
    one = partial(_verify_one, cfg)
    return jax.vmap(one, in_axes=(None, None, 0, 0, 0))(
        src_xy, src_mask, tgt_xy, tgt_mask, init_rel_rad
    )


def relative_pose_deg(pose_a_deg, pose_b_deg):
    """b expressed in a's frame, degrees (init guess for verification)."""
    return pose2.cal_motion(pose_b_deg, pose_a_deg)
