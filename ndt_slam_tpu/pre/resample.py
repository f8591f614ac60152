"""Uniform arc-length scan resampling.

Re-spaces scan points to spacing `space` along the measured polyline,
dropping points that arrive sooner and inserting interpolated points on
longer segments; a segment whose accumulated length reaches
`space_thre` is treated as a range discontinuity and the raw point is
kept as-is (reference: src/ScanPointResampler.cpp:4-62).

Two implementations with identical semantics:

- `resample_points_np`: host NumPy, used by the input pipeline (this is
  preprocessing — it belongs on the host next to the log parser, like a
  tokenizer in an ML input pipeline).
- `resample_points_jax`: jittable `lax.scan` version with a bounded
  inner interpolation loop, for fully on-device pipelines and the
  multi-chip dry-run path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ndt_slam_tpu.core.points import PAD_COORD


def resample_points_np(
    xy: np.ndarray, space: float = 0.05, space_thre: float = 0.25
) -> np.ndarray:
    """Resample an [n,2] polyline of scan points. Returns [m,2].

    Mirrors the reference walk: keep the first point; for each next
    point accumulate distance `dis`; drop while dis+L < space; keep raw
    and reset when dis+L >= space_thre; otherwise insert the point at
    exactly `space` along the segment and re-examine the current point.
    """
    xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    n = xy.shape[0]
    if n == 0:
        return np.zeros((0, 2), dtype=np.float32)

    out = [xy[0].copy()]
    prev = xy[0].copy()
    dis = 0.0
    i = 1
    while i < n:
        cp = xy[i]
        d = cp - prev
        L = float(np.hypot(d[0], d[1]))
        if dis + L < space:
            dis += L
            prev = cp
            i += 1
        elif dis + L >= space_thre:
            out.append(cp.copy())
            prev = cp
            dis = 0.0
            i += 1
        else:
            ratio = (space - dis) / L
            npnt = prev + d * ratio
            out.append(npnt)
            prev = npnt
            dis = 0.0
            # re-examine current point against the inserted one
    return np.asarray(out, dtype=np.float32)


def resample_points_jax(
    xy: jnp.ndarray,
    mask: jnp.ndarray,
    space: float = 0.05,
    space_thre: float = 0.25,
    max_inserts_per_point: int = 8,
):
    """Jittable resampler over a padded buffer. Returns (xy, mask) with
    the same capacity, valid points compacted to the front.

    The inner interpolation loop is bounded: a segment shorter than
    `space_thre` can yield at most ceil(space_thre/space) inserted
    points; `max_inserts_per_point` must be >= that bound.
    """
    cap = xy.shape[0]
    n_valid = jnp.sum(mask.astype(jnp.int32))

    out0 = jnp.full((cap, 2), PAD_COORD, dtype=xy.dtype)
    # First valid point is always kept. Guard the empty-scan case.
    first = xy[0]
    out0 = out0.at[0].set(jnp.where(n_valid > 0, first, out0[0]))

    def step(carry, inp):
        prev, dis, widx, out = carry
        cp, valid = inp

        def inner(state):
            prev, dis, widx, out, active = state
            d = cp - prev
            L = jnp.sqrt(jnp.sum(d * d))
            drop = dis + L < space
            raw = dis + L >= space_thre

            ratio = jnp.where(L > 0, (space - dis) / jnp.maximum(L, 1e-12), 0.0)
            interp_pt = prev + d * ratio
            new_pt = jnp.where(raw, cp, interp_pt)

            emit = active & ~drop
            out = jax.lax.cond(
                emit & (widx < cap),
                lambda o: o.at[widx].set(new_pt),
                lambda o: o,
                out,
            )
            widx = widx + emit.astype(jnp.int32)
            prev = jnp.where(emit, new_pt, jnp.where(active & drop, cp, prev))
            dis = jnp.where(emit, 0.0, jnp.where(active & drop, dis + L, dis))
            # keep looping only when we interpolated (re-examine cp)
            active = emit & ~raw
            return prev, dis, widx, out, active

        def cond(state):
            return state[4]

        prev, dis, widx, out, _ = jax.lax.while_loop(
            cond, inner, (prev, dis, widx, out, valid)
        )
        return (prev, dis, widx, out), None

    init = (first, jnp.float32(0.0), jnp.int32(1), out0)
    # Skip index 0 (already emitted); scan the rest.
    (prev, dis, widx, out), _ = jax.lax.scan(
        step, init, (xy[1:], mask[1:])
    )
    count = jnp.where(n_valid > 0, widx, 0)
    idx = jnp.arange(cap)
    new_mask = idx < count
    out = jnp.where(new_mask[:, None], out, PAD_COORD)
    return out, new_mask
