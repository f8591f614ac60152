"""NDT grid construction: per-cell mean/covariance over a dense 2D window.

TPU-native replacement for PCL's VoxelGridCovariance (used by the
reference via pcl::NormalDistributionsTransform; reference:
include/ndt_slam/PoseEstimator.h:19-31, SURVEY.md §2.2):

- The grid is a dense, fixed-shape (nx*ny) window recentered each frame
  on the registration initial guess. The reference rebuilds its target
  grid every frame anyway (src/PoseEstimator.cpp:17-19), so a fresh
  dense window per frame is parity behavior with static shapes.
- Statistics are accumulated with `segment_sum` scatters (one pass over
  the padded target buffer), not per-cell loops.
- Near-singular covariances are inflated exactly like PCL: if
  lambda_min < eps * lambda_max, reconstruct with the floored
  eigenvalue (closed-form 2x2 eigendecomposition).
- Cells with fewer than `min_pts` points are invalid (PCL default 6).

All arrays are float32; the Newton solve accumulates in float32 which
is ample for thousands-of-points sums (validated in tests against
float64 NumPy).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NDTGrid(NamedTuple):
    origin: jnp.ndarray    # [2] lower-left corner of the window (world)
    mean: jnp.ndarray      # [C, 2] per-cell mean
    inv_cov: jnp.ndarray   # [C, 2, 2] per-cell inverse covariance
    valid: jnp.ndarray     # [C] bool
    # static metadata (python ints/floats — part of the jit cache key)
    nx: int
    ny: int
    resolution: float


def _inflate_and_invert(cov: jnp.ndarray, eig_mult: float = 0.01):
    """Per-cell 2x2: floor lambda_min at eig_mult*lambda_max, invert.

    cov: [C, 2, 2] symmetric. Returns ([C,2,2] inverse, [C] ok flag).
    Mirrors PCL VoxelGridCovariance::computeVoxelCentroids' eigenvalue
    inflation (min_covar_eigvalue_mult_ = 0.01).
    """
    a = cov[:, 0, 0]
    b = cov[:, 0, 1]
    c = cov[:, 1, 1]
    tr_half = 0.5 * (a + c)
    det_root = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    lam1 = tr_half + det_root  # lambda_max
    lam2 = tr_half - det_root  # lambda_min

    # Eigenvector for lam1 (handle b ~ 0: axis-aligned).
    use_b = jnp.abs(b) > 1e-12
    v1x = jnp.where(use_b, lam1 - c, jnp.where(a >= c, 1.0, 0.0))
    v1y = jnp.where(use_b, b, jnp.where(a >= c, 0.0, 1.0))
    nrm = jnp.sqrt(v1x * v1x + v1y * v1y)
    v1x = v1x / jnp.maximum(nrm, 1e-20)
    v1y = v1y / jnp.maximum(nrm, 1e-20)
    # v2 orthogonal to v1
    v2x, v2y = -v1y, v1x

    lam1_f = jnp.maximum(lam1, 1e-12)
    lam2_f = jnp.maximum(lam2, eig_mult * lam1_f)

    # Reconstruct inflated covariance, then closed-form inverse.
    ia = lam1_f * v1x * v1x + lam2_f * v2x * v2x
    ib = lam1_f * v1x * v1y + lam2_f * v2x * v2y
    ic = lam1_f * v1y * v1y + lam2_f * v2y * v2y
    det = ia * ic - ib * ib
    ok = det > 1e-20
    inv_det = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-20), 0.0)
    inv = jnp.stack(
        [
            jnp.stack([ic * inv_det, -ib * inv_det], axis=-1),
            jnp.stack([-ib * inv_det, ia * inv_det], axis=-1),
        ],
        axis=-2,
    )
    return inv, ok


def build_grid(
    xy: jnp.ndarray,
    mask: jnp.ndarray,
    center: jnp.ndarray,
    nx: int,
    ny: int,
    resolution: float,
    min_pts: int = 6,
    eig_mult: float = 0.01,
) -> NDTGrid:
    """Build the NDT grid from a padded target buffer.

    xy: [N,2], mask: [N], center: [2] — the window is centered on
    `center`, snapped to the cell lattice so consecutive frames see
    stable cell boundaries.
    """
    num_cells = nx * ny
    origin = (
        jnp.floor(
            (center - jnp.array([nx, ny], dtype=xy.dtype) * (resolution / 2.0))
            / resolution
        )
        * resolution
    )

    rel = (xy - origin) / resolution
    ci = jnp.floor(rel).astype(jnp.int32)
    in_bounds = (
        (ci[:, 0] >= 0) & (ci[:, 0] < nx) & (ci[:, 1] >= 0) & (ci[:, 1] < ny)
    )
    ok = mask & in_bounds
    # invalid points scatter into a dump cell (index = num_cells)
    cid = jnp.where(ok, ci[:, 0] * ny + ci[:, 1], num_cells)

    ones = ok.astype(xy.dtype)
    count = jax.ops.segment_sum(ones, cid, num_segments=num_cells + 1)
    sx = jax.ops.segment_sum(jnp.where(ok, xy[:, 0], 0.0), cid, num_segments=num_cells + 1)
    sy = jax.ops.segment_sum(jnp.where(ok, xy[:, 1], 0.0), cid, num_segments=num_cells + 1)
    sxx = jax.ops.segment_sum(jnp.where(ok, xy[:, 0] * xy[:, 0], 0.0), cid, num_segments=num_cells + 1)
    sxy = jax.ops.segment_sum(jnp.where(ok, xy[:, 0] * xy[:, 1], 0.0), cid, num_segments=num_cells + 1)
    syy = jax.ops.segment_sum(jnp.where(ok, xy[:, 1] * xy[:, 1], 0.0), cid, num_segments=num_cells + 1)

    count = count[:num_cells]
    sx, sy = sx[:num_cells], sy[:num_cells]
    sxx, sxy, syy = sxx[:num_cells], sxy[:num_cells], syy[:num_cells]

    n = jnp.maximum(count, 1.0)
    mx, my = sx / n, sy / n
    # Unbiased covariance (PCL divides by n-1).
    nm1 = jnp.maximum(count - 1.0, 1.0)
    cxx = (sxx - count * mx * mx) / nm1
    cxy = (sxy - count * mx * my) / nm1
    cyy = (syy - count * my * my) / nm1
    cov = jnp.stack(
        [
            jnp.stack([cxx, cxy], axis=-1),
            jnp.stack([cxy, cyy], axis=-1),
        ],
        axis=-2,
    )
    inv_cov, inv_ok = _inflate_and_invert(cov, eig_mult)
    valid = (count >= min_pts) & inv_ok

    mean = jnp.stack([mx, my], axis=-1)
    # Park invalid cells far away so a stray unmasked lookup scores ~0.
    mean = jnp.where(valid[:, None], mean, 1.0e8)
    inv_cov = jnp.where(valid[:, None, None], inv_cov, 0.0)

    return NDTGrid(
        origin=origin,
        mean=mean,
        inv_cov=inv_cov,
        valid=valid,
        nx=nx,
        ny=ny,
        resolution=resolution,
    )
