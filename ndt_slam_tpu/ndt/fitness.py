"""Fitness score: mean squared nearest-neighbor distance, as matmuls.

Replaces PCL's KdTree getFitnessScore pass (reference:
src/PoseEstimator.cpp:42-46; SURVEY.md §3.3 "2nd hot loop"). On TPU a
brute-force nearest neighbor is the right design: |s - t|^2 =
|s|^2 + |t|^2 - 2 s·t, so the dominant term is an [N, M] matmul that
lands on the MXU. Targets are streamed in chunks so peak memory is
[N, chunk] rather than [N, M].

Exactness: unlike grid-hashed NN, this is the true nearest neighbor,
so the accept/reject threshold (score_thre = 0.5) flips on exactly the
same quantity as the reference (SURVEY.md §7.3 item 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ndt_slam_tpu.core.vma import cast_to_vma, vma_of

_BIG = 1.0e12


def nn_sq_dists(
    src_xy: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xy: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    chunk: int = 4096,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Per-source-point squared distance to the nearest valid target.

    Returns [N] with _BIG for masked sources or when no targets exist.
    With `axis_name` set (inside shard_map), the TARGET buffer is
    sharded along that mesh axis: each device scans its target shard and
    the per-source best is pmin'd, so every device ends with the global
    nearest-neighbor distances (sources replicated).
    """
    n = src_xy.shape[0]
    m = tgt_xy.shape[0]
    chunk = min(chunk, m)
    # Pad targets so m divides evenly (mask guards correctness).
    pad = (-m) % chunk
    if pad:
        tgt_xy = jnp.concatenate(
            [tgt_xy, jnp.zeros((pad, 2), tgt_xy.dtype)], axis=0
        )
        tgt_mask = jnp.concatenate(
            [tgt_mask, jnp.zeros((pad,), bool)], axis=0
        )
    num_chunks = tgt_xy.shape[0] // chunk
    tgt_xy = tgt_xy.reshape(num_chunks, chunk, 2)
    tgt_mask = tgt_mask.reshape(num_chunks, chunk)

    s_sq = jnp.sum(src_xy * src_xy, axis=-1)  # [N]

    def body(carry, tgt):
        best = carry
        t_xy, t_mask = tgt
        t_sq = jnp.sum(t_xy * t_xy, axis=-1)                    # [C]
        # Full-f32 matmul (precision=HIGHEST): bf16 passes would corrupt
        # squared distances at map-scale coordinates.
        cross = jax.lax.dot_general(
            src_xy, t_xy.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                                        # [N,C] MXU
        d2 = s_sq[:, None] + t_sq[None, :] - 2.0 * cross
        d2 = jnp.where(t_mask[None, :], d2, _BIG)
        best = jnp.minimum(best, jnp.min(d2, axis=-1))
        return best, None

    best0 = jnp.full((n,), _BIG, dtype=src_xy.dtype)
    # carry vma = union of the body's inputs (no collectives inside)
    best0 = cast_to_vma(
        best0, vma_of(src_xy, src_mask, tgt_xy, tgt_mask)
    )
    best, _ = jax.lax.scan(body, best0, (tgt_xy, tgt_mask))
    if axis_name is not None:
        best = jax.lax.pmin(best, axis_name)
    best = jnp.maximum(best, 0.0)  # numerical floor
    return jnp.where(src_mask, best, _BIG)


def fitness_score(
    src_xy: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xy: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    chunk: int = 4096,
    axis_name: str | None = None,
    sharded: str = "sources",
) -> jnp.ndarray:
    """Mean squared NN distance over valid source points (PCL semantics:
    no max-range cutoff, mean over all source points).

    With `axis_name` set (inside shard_map), `sharded` picks the layout:
    - "sources": source points sharded, targets replicated — each device
      scores its source shard and (total, n) are psum'd. This composes
      with `align(axis_name=...)`, which shards sources the same way.
    - "targets": targets sharded, sources replicated — per-source best
      is pmin'd across devices (see nn_sq_dists).
    - "both": sources AND targets sharded — targets are all_gather'd
      (tiled) first, then source-sharded semantics. Peak memory is one
      full target buffer per device; the gather rides ICI once per call.
    """
    if axis_name is not None and sharded == "both":
        tgt_xy = jax.lax.all_gather(tgt_xy, axis_name, tiled=True)
        tgt_mask = jax.lax.all_gather(tgt_mask, axis_name, tiled=True)
        sharded = "sources"
    tgt_axis = axis_name if sharded == "targets" else None
    d2 = nn_sq_dists(src_xy, src_mask, tgt_xy, tgt_mask, chunk, tgt_axis)
    n = jnp.sum(src_mask.astype(src_xy.dtype))
    have_tgt = jnp.any(tgt_mask)
    total = jnp.sum(jnp.where(src_mask, d2, 0.0))
    if axis_name is not None:
        have_tgt = jax.lax.pmax(have_tgt, axis_name)
        if sharded == "sources":
            total = jax.lax.psum(total, axis_name)
            n = jax.lax.psum(n, axis_name)
    mean = total / jnp.maximum(n, 1.0)
    return jnp.where((n > 0) & have_tgt, mean, _BIG)


# (An `overlap_fitness` helper once lived here; the trimmed-ICP loop
# verifier (ndt/icp.py) computes its overlap/trim gates itself, so the
# helper was removed rather than kept as dead code.)
