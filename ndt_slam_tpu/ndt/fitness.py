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

_BIG = 1.0e12


def nn_sq_dists(
    src_xy: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xy: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    chunk: int = 4096,
) -> jnp.ndarray:
    """Per-source-point squared distance to the nearest valid target.

    Returns [N] with _BIG for masked sources or when no targets exist.
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
    best, _ = jax.lax.scan(body, best0, (tgt_xy, tgt_mask))
    best = jnp.maximum(best, 0.0)  # numerical floor
    return jnp.where(src_mask, best, _BIG)


def fitness_score(
    src_xy: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xy: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    chunk: int = 4096,
) -> jnp.ndarray:
    """Mean squared NN distance over valid source points (PCL semantics:
    no max-range cutoff, mean over all source points)."""
    d2 = nn_sq_dists(src_xy, src_mask, tgt_xy, tgt_mask, chunk)
    n = jnp.sum(src_mask.astype(src_xy.dtype))
    have_tgt = jnp.any(tgt_mask)
    total = jnp.sum(jnp.where(src_mask, d2, 0.0))
    mean = total / jnp.maximum(n, 1.0)
    return jnp.where((n > 0) & have_tgt, mean, _BIG)
