"""Trimmed point-to-point ICP refinement (closed-form SE(2) updates).

Used as the precision finisher after the coarse-to-fine NDT ladder in
loop-closure verification (graph/loop_closure.py): NDT provides the
wide basin, but with sharp cm-noise cells its fine-resolution optimum
can sit a sizable fraction of a cell away from the metric optimum for
sparse single-scan targets. Trimmed ICP has a basin ~ the match cutoff
and converges to the unbiased least-squares alignment.

TPU shape: the NN pass is the same |s-t|^2-as-matmul used by
ndt/fitness.py (MXU), correspondence soft-selection is one argmin, and
the SE(2) update is a closed-form weighted Procrustes (no solver). The
whole refinement is a fixed-count fori_loop — jit/vmap friendly.

The reference has no ICP anywhere (it relies on pcl::NDT only,
include/ndt_slam/PoseEstimator.h:19-31); this is a TPU-era addition
for the loop-closure subsystem the reference left disabled.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = 1.0e12


class ICPResult(NamedTuple):
    pose_rad: jnp.ndarray   # [3]
    matched_frac: jnp.ndarray
    mean_sq_err: jnp.ndarray  # over matched pairs


def _transform(pose, xy):
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    x = c * xy[:, 0] - s * xy[:, 1] + pose[0]
    y = s * xy[:, 0] + c * xy[:, 1] + pose[1]
    return jnp.stack([x, y], axis=-1)


def _nn(src_w, tgt_xy, tgt_mask, chunk):
    """Per-source NN (d2, index) over valid targets, chunked matmuls."""
    m = tgt_xy.shape[0]
    chunk = min(chunk, m)
    pad = (-m) % chunk
    if pad:
        tgt_xy = jnp.concatenate(
            [tgt_xy, jnp.zeros((pad, 2), tgt_xy.dtype)], 0
        )
        tgt_mask = jnp.concatenate([tgt_mask, jnp.zeros((pad,), bool)], 0)
    nchunk = tgt_xy.shape[0] // chunk
    tc = tgt_xy.reshape(nchunk, chunk, 2)
    mc = tgt_mask.reshape(nchunk, chunk)
    s_sq = jnp.sum(src_w * src_w, axis=-1)

    def body(carry, inp):
        best_d, best_i = carry
        k, t_xy, t_mask = inp
        t_sq = jnp.sum(t_xy * t_xy, axis=-1)
        cross = jax.lax.dot_general(
            src_w, t_xy.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2 = s_sq[:, None] + t_sq[None, :] - 2.0 * cross
        d2 = jnp.where(t_mask[None, :], d2, _BIG)
        loc = jnp.argmin(d2, axis=-1)
        dmin = jnp.take_along_axis(d2, loc[:, None], axis=-1)[:, 0]
        upd = dmin < best_d
        best_i = jnp.where(upd, k * chunk + loc, best_i)
        best_d = jnp.where(upd, dmin, best_d)
        return (best_d, best_i), None

    n = src_w.shape[0]
    from ndt_slam_tpu.core.vma import cast_to_vma, vma_of
    vma = vma_of(src_w, tgt_xy, tgt_mask)
    init = (
        cast_to_vma(jnp.full((n,), _BIG, jnp.float32), vma),
        cast_to_vma(jnp.zeros((n,), jnp.int32), vma),
    )
    ks = jnp.arange(nchunk)
    (best_d, best_i), _ = jax.lax.scan(body, init, (ks, tc, mc))
    return jnp.maximum(best_d, 0.0), best_i


def icp_refine(
    init_pose_rad: jnp.ndarray,
    src_xy: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xy: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    match_dist: float = 0.4,
    iterations: int = 10,
    chunk: int = 4096,
) -> ICPResult:
    """Trimmed point-to-point ICP from `init_pose_rad`."""
    md2 = match_dist * match_dist

    def body(_, pose):
        src_w = _transform(pose, src_xy)
        d2, idx = _nn(src_w, tgt_xy, tgt_mask, chunk)
        w = (src_mask & (d2 < md2)).astype(jnp.float32)
        tw = jnp.take(tgt_xy, idx, axis=0)          # matched targets
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        # weighted Procrustes in the CURRENT source frame
        mu_s = jnp.sum(src_w * w[:, None], 0) / wsum
        mu_t = jnp.sum(tw * w[:, None], 0) / wsum
        ds = src_w - mu_s
        dt = tw - mu_t
        sxx = jnp.sum(w * ds[:, 0] * dt[:, 0])
        sxy = jnp.sum(w * ds[:, 0] * dt[:, 1])
        syx = jnp.sum(w * ds[:, 1] * dt[:, 0])
        syy = jnp.sum(w * ds[:, 1] * dt[:, 1])
        dth = jnp.arctan2(sxy - syx, sxx + syy)
        c, s = jnp.cos(dth), jnp.sin(dth)
        # delta transform: rotate about mu_s by dth, translate to mu_t
        dx = mu_t[0] - (c * mu_s[0] - s * mu_s[1])
        dy = mu_t[1] - (s * mu_s[0] + c * mu_s[1])
        # compose onto pose: new = delta ∘ pose
        nx = c * pose[0] - s * pose[1] + dx
        ny = s * pose[0] + c * pose[1] + dy
        nth = pose[2] + dth
        new_pose = jnp.stack([nx, ny, nth])
        ok = jnp.sum(w) >= 3.0
        return jnp.where(ok, new_pose, pose)

    pose = jax.lax.fori_loop(
        0, iterations, body, init_pose_rad.astype(jnp.float32)
    )

    src_w = _transform(pose, src_xy)
    d2, _ = _nn(src_w, tgt_xy, tgt_mask, chunk)
    matched = src_mask & (d2 < md2)
    n_valid = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
    n_match = jnp.sum(matched.astype(jnp.float32))
    mse = jnp.sum(jnp.where(matched, d2, 0.0)) / jnp.maximum(n_match, 1.0)
    mse = jnp.where(n_match > 0, mse, _BIG)
    return ICPResult(
        pose_rad=pose,
        matched_frac=n_match / n_valid,
        mean_sq_err=mse,
    )
