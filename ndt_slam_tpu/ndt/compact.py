"""Compact-cell NDT engine: gather-free score/grad/Hessian.

Why this exists: the dense-window grid (ndt/grid.py) is built over
nx*ny cells but only a tiny fraction are valid (a 2D LiDAR map is a
set of curves — measured: ~300 valid of 36k cells on the bench
workload). The straightforward per-point neighbor GATHER formulation
(ndt/score.py) is row-gather-bound on TPU (~90 ns/row via XLA gather,
~2.8 ms per derivative pass). This module instead:

1. Compacts the valid cells into a fixed-capacity table [K]
   (`compact_grid`, one gather of K rows per frame — not per Newton
   iteration).
2. Evaluates ALL (point, cell) pairs [N, K] with pure VPU elementwise
   broadcasts — qx/qy are direct differences (no catastrophic
   cancellation, unlike a quadratic-expansion matmul at map-scale
   coordinates in f32), weighted by the same 3x3-cell index-window
   test the gather engine applies.
3. Reduces over K per point, then over points — XLA fuses the whole
   pass into a few VPU loops; nothing is materialized in HBM.

Semantics match ndt/score.py exactly (same mixture constants, same
md clamp, same neighborhood radius definition); parity is enforced by
tests/unit/test_compact.py. Sharding composes the same way: points
sharded over a mesh axis, psum the (E, g, H, matched) reductions —
the compact table is replicated (it is tiny: K x 8 floats).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndt_slam_tpu.ndt.grid import NDTGrid


class CompactGrid(NamedTuple):
    """Fixed-capacity table of the valid NDT cells.

    kx, ky: [K] float32 cell indices (integral values); mx, my: [K]
    cell means (absolute map frame); b00, b01, b11: [K] inverse
    covariance entries; valid: [K] bool; origin/resolution/nx/ny as in
    NDTGrid (origin is [2] float32).
    """
    kx: jnp.ndarray
    ky: jnp.ndarray
    mx: jnp.ndarray
    my: jnp.ndarray
    b00: jnp.ndarray
    b01: jnp.ndarray
    b11: jnp.ndarray
    valid: jnp.ndarray
    origin: jnp.ndarray
    # static
    nx: int
    ny: int
    resolution: float

    @property
    def capacity(self) -> int:
        return self.kx.shape[0]


def compact_grid(grid: NDTGrid, capacity: int) -> CompactGrid:
    """Compact `grid`'s valid cells into a [capacity] table.

    Overflow policy: cells beyond `capacity` (in cell-id order) are
    dropped — size the capacity to the environment (a 2D scan-curve
    map occupies O(perimeter/resolution) cells, far below nx*ny).
    """
    num_cells = grid.nx * grid.ny
    idx = jnp.nonzero(
        grid.valid, size=capacity, fill_value=num_cells
    )[0]
    ok = idx < num_cells
    safe = jnp.where(ok, idx, 0)
    kx = (safe // grid.ny).astype(jnp.float32)
    ky = (safe % grid.ny).astype(jnp.float32)
    mean = jnp.take(grid.mean, safe, axis=0)
    icov = jnp.take(grid.inv_cov, safe, axis=0)
    z = jnp.float32(0.0)
    return CompactGrid(
        kx=jnp.where(ok, kx, -1e9),
        ky=jnp.where(ok, ky, -1e9),
        mx=jnp.where(ok, mean[:, 0], z),
        my=jnp.where(ok, mean[:, 1], z),
        b00=jnp.where(ok, icov[:, 0, 0], z),
        b01=jnp.where(ok, icov[:, 0, 1], z),
        b11=jnp.where(ok, icov[:, 1, 1], z),
        valid=ok & jnp.take(grid.valid, safe),
        origin=grid.origin,
        nx=grid.nx,
        ny=grid.ny,
        resolution=grid.resolution,
    )


def _transform(pose_rad, xy):
    c, s = jnp.cos(pose_rad[2]), jnp.sin(pose_rad[2])
    x = c * xy[:, 0] - s * xy[:, 1] + pose_rad[0]
    y = s * xy[:, 0] + c * xy[:, 1] + pose_rad[1]
    return x, y, c, s


def _pair_terms(pose_rad, xy, mask, cg: CompactGrid, d2: float, radius: int):
    """Shared [N,K] pair quantities (weights and exp terms)."""
    px, py, c, s = _transform(pose_rad, xy)
    # integral cell index of each transformed point (float is exact for
    # the small index range)
    fx = jnp.floor((px - cg.origin[0]) / cg.resolution)
    fy = jnp.floor((py - cg.origin[1]) / cg.resolution)
    r = jnp.float32(radius)
    in_win = (
        (jnp.abs(fx[:, None] - cg.kx[None, :]) <= r)
        & (jnp.abs(fy[:, None] - cg.ky[None, :]) <= r)
    )
    w = (in_win & mask[:, None] & cg.valid[None, :]).astype(xy.dtype)

    qx = px[:, None] - cg.mx[None, :]          # [N,K] exact differences
    qy = py[:, None] - cg.my[None, :]
    bqx = cg.b00[None, :] * qx + cg.b01[None, :] * qy
    bqy = cg.b01[None, :] * qx + cg.b11[None, :] * qy
    md = qx * bqx + qy * bqy
    e = jnp.exp(-0.5 * d2 * jnp.minimum(md, 50.0 / d2))
    return px, py, c, s, w, e, bqx, bqy


def ndt_negative_score_compact(
    pose_rad, xy, mask, cg: CompactGrid, d1: float, d2: float,
    radius: int = 1,
):
    """E(p), identical semantics to ndt_negative_score (score.py)."""
    _, _, _, _, w, e, _, _ = _pair_terms(pose_rad, xy, mask, cg, d2, radius)
    return jnp.sum(w * (d1 * e))


def ndt_score_grad_hess_compact(
    pose_rad, xy, mask, cg: CompactGrid, d1: float, d2: float,
    radius: int = 1,
):
    """Fused (E, grad[3], hess[3,3], matched) — see ndt/score.py for
    the derivation; identical math, [N,K] broadcast layout."""
    px, py, c, s, w, e, bqx, bqy = _pair_terms(
        pose_rad, xy, mask, cg, d2, radius
    )
    E = jnp.sum(w * (d1 * e))
    matched = jnp.sum(w)

    coef = (-d1 * d2) * w * e                  # [N,K]
    gqx_s = jnp.sum(coef * bqx, axis=1)        # [N]
    gqy_s = jnp.sum(coef * bqy, axis=1)

    a = -s * xy[:, 0] - c * xy[:, 1]
    b = c * xy[:, 0] - s * xy[:, 1]

    g0 = jnp.sum(gqx_s)
    g1 = jnp.sum(gqy_s)
    g2 = jnp.sum(a * gqx_s + b * gqy_s)
    grad = jnp.stack([g0, g1, g2])

    hq00_s = jnp.sum(coef * (cg.b00[None, :] - d2 * bqx * bqx), axis=1)
    hq01_s = jnp.sum(coef * (cg.b01[None, :] - d2 * bqx * bqy), axis=1)
    hq11_s = jnp.sum(coef * (cg.b11[None, :] - d2 * bqy * bqy), axis=1)

    h00 = jnp.sum(hq00_s)
    h01 = jnp.sum(hq01_s)
    h11 = jnp.sum(hq11_s)
    h02 = jnp.sum(a * hq00_s + b * hq01_s)
    h12 = jnp.sum(a * hq01_s + b * hq11_s)
    h22_rot = jnp.sum(a * a * hq00_s + 2.0 * a * b * hq01_s + b * b * hq11_s)
    d2x = -(px - pose_rad[0])
    d2y = -(py - pose_rad[1])
    h22 = h22_rot + jnp.sum(gqx_s * d2x + gqy_s * d2y)

    hess = jnp.stack(
        [
            jnp.stack([h00, h01, h02]),
            jnp.stack([h01, h11, h12]),
            jnp.stack([h02, h12, h22]),
        ]
    )
    return E, grad, hess, matched
