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


def grid_origin(center: jnp.ndarray, nx: int, ny: int, resolution: float):
    """Window origin centered on `center`, snapped to the cell lattice so
    consecutive frames see stable cell boundaries."""
    half = jnp.array([nx, ny], dtype=center.dtype) * (resolution / 2.0)
    return jnp.floor((center - half) / resolution) * resolution


def grid_moments(
    xy: jnp.ndarray,
    mask: jnp.ndarray,
    origin: jnp.ndarray,
    nx: int,
    ny: int,
    resolution: float,
):
    """Per-cell accumulation pass: (count, sx, sy, sxx, sxy, syy), each
    [nx*ny]. Pure scatter — additive, so shards can psum their partial
    moments before `grid_finalize` (the multi-chip split point)."""
    num_cells = nx * ny
    rel = (xy - origin) / resolution
    ci = jnp.floor(rel).astype(jnp.int32)
    in_bounds = (
        (ci[:, 0] >= 0) & (ci[:, 0] < nx) & (ci[:, 1] >= 0) & (ci[:, 1] < ny)
    )
    ok = mask & in_bounds
    # invalid points scatter into a dump cell (index = num_cells)
    cid = jnp.where(ok, ci[:, 0] * ny + ci[:, 1], num_cells)

    # Accumulate in CELL-relative coordinates (each point minus its own
    # cell's lower corner, magnitude <= resolution): the sum-of-squares
    # cancellation (sxx - n*mx^2) is then exact to f32 roundoff, where
    # absolute map-scale coordinates lose ~4 digits. The cell corner is
    # deterministic from cid, so partial moments stay additive across
    # shards (psum-safe); grid_finalize adds the corner back.
    cx = ci[:, 0].astype(xy.dtype) * resolution + origin[0]
    cy = ci[:, 1].astype(xy.dtype) * resolution + origin[1]
    xr = jnp.where(ok, xy[:, 0] - cx, 0.0)
    yr = jnp.where(ok, xy[:, 1] - cy, 0.0)
    # One fused scatter of all six moments ([N,6] rows) — six separate
    # segment_sum calls would serialize six scatter passes on TPU.
    ones = ok.astype(xy.dtype)
    rows = jnp.stack(
        [ones, xr, yr, xr * xr, xr * yr, yr * yr], axis=-1
    )
    acc = jax.ops.segment_sum(rows, cid, num_segments=num_cells + 1)
    acc = acc[:num_cells]
    count, sx, sy, sxx, sxy, syy = (acc[:, i] for i in range(6))
    return count, sx, sy, sxx, sxy, syy


def grid_finalize(
    moments,
    origin: jnp.ndarray,
    nx: int,
    ny: int,
    resolution: float,
    min_pts: int = 6,
    eig_mult: float = 0.01,
) -> NDTGrid:
    """Turn (psum'd) moments into per-cell mean / inverse covariance."""
    count, sx, sy, sxx, sxy, syy = moments
    cell = jnp.arange(nx * ny, dtype=jnp.int32)
    corner_x = (cell // ny).astype(sx.dtype) * resolution + origin[0]
    corner_y = (cell % ny).astype(sy.dtype) * resolution + origin[1]
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

    # moments were cell-relative; restore absolute means
    mean = jnp.stack([mx + corner_x, my + corner_y], axis=-1)
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


# ---------------------------------------------------------------------------
# Incremental moment lattice (VERDICT r4 next-round #2).
#
# The per-frame build above rescatters the WHOLE local-map buffer
# (131k padded points at production capacity) although the target
# changes by ONE appended scan per frame — moments are additive, so a
# per-submap lattice of running moments turns the per-frame cost into
# (a) one ~2k-point scatter when a scan is appended and (b) a window
# slice + finalize at registration time. Cells are keyed by ABSOLUTE
# lattice index floor(x / resolution) so the assignment is independent
# of any window origin: the same point lands in the same cell whether
# it is scattered into the running lattice or into a from-scratch
# frame window, and cell-relative coordinates (x - cell*resolution)
# are computed identically in both paths — the only difference from a
# full rebuild is f32 summation ORDER (~ulp).
# ---------------------------------------------------------------------------


def lattice_anchor(center, cells: int, resolution: float):
    """Integer lattice index of the lower-left corner of a `cells`-wide
    window centered on `center` (host or device [2])."""
    half = jnp.asarray(center) / resolution - cells / 2.0
    return jnp.floor(half).astype(jnp.int32)


def moments_abs(
    xy: jnp.ndarray,
    mask: jnp.ndarray,
    anchor: jnp.ndarray,     # [2] int32 absolute index of cell (0,0)
    nx: int,
    ny: int,
    resolution: float,
) -> jnp.ndarray:
    """[nx*ny, 6] moment rows (count, sx, sy, sxx, sxy, syy) of the
    masked points, cells keyed by absolute index minus `anchor`.
    Additive: lattices accumulate by `+` across scans / shards."""
    num_cells = nx * ny
    ci_abs = jnp.floor(xy / resolution).astype(jnp.int32)
    ci = ci_abs - anchor[None, :]
    ok = (
        mask
        & (ci[:, 0] >= 0) & (ci[:, 0] < nx)
        & (ci[:, 1] >= 0) & (ci[:, 1] < ny)
    )
    cid = jnp.where(ok, ci[:, 0] * ny + ci[:, 1], num_cells)
    corner = ci_abs.astype(xy.dtype) * resolution
    xr = jnp.where(ok, xy[:, 0] - corner[:, 0], 0.0)
    yr = jnp.where(ok, xy[:, 1] - corner[:, 1], 0.0)
    ones = ok.astype(xy.dtype)
    rows = jnp.stack([ones, xr, yr, xr * xr, xr * yr, yr * yr], axis=-1)
    acc = jax.ops.segment_sum(rows, cid, num_segments=num_cells + 1)
    return acc[:num_cells]


def window_grid_from_lattice(
    mom: jnp.ndarray,        # [B*B? no: [Bx*By, 6] running lattice
    mom_anchor: jnp.ndarray,  # [2] int32
    bx: int,
    by: int,
    frame_anchor: jnp.ndarray,  # [2] int32 window anchor
    nx: int,
    ny: int,
    resolution: float,
    extra: jnp.ndarray | None = None,  # [nx*ny, 6] fresh-scan moments
    min_pts: int = 6,
    eig_mult: float = 0.01,
):
    """Slice the [nx,ny] frame window out of the running lattice, add
    optional fresh moments, finalize to an NDTGrid.

    Returns (grid, in_range): `in_range` is False when the requested
    window does not fit inside the lattice — dynamic_slice CLAMPS the
    start in that case, so the caller must fall back to a full rebuild
    for that frame (the margin is sized so this cannot happen under
    the configured submap travel; the flag makes violations loud
    instead of silently wrong)."""
    off = frame_anchor - mom_anchor
    in_range = (
        (off[0] >= 0) & (off[0] <= bx - nx)
        & (off[1] >= 0) & (off[1] <= by - ny)
    )
    win = jax.lax.dynamic_slice(
        mom.reshape(bx, by, 6), (off[0], off[1], 0), (nx, ny, 6)
    ).reshape(nx * ny, 6)
    if extra is not None:
        win = win + extra
    origin = frame_anchor.astype(jnp.float32) * resolution
    moments = tuple(win[:, i] for i in range(6))
    grid = _finalize_abs(
        moments, origin, frame_anchor, nx, ny, resolution,
        min_pts, eig_mult,
    )
    return grid, in_range


def _finalize_abs(moments, origin, anchor, nx, ny, resolution,
                  min_pts, eig_mult) -> NDTGrid:
    """grid_finalize with corners restored from ABSOLUTE cell indices
    ((local + anchor) * resolution — the exact floats moments_abs
    subtracted, so the cancellation-free reconstruction is exact)."""
    count, sx, sy, sxx, sxy, syy = moments
    cell = jnp.arange(nx * ny, dtype=jnp.int32)
    corner_x = ((cell // ny) + anchor[0]).astype(sx.dtype) * resolution
    corner_y = ((cell % ny) + anchor[1]).astype(sy.dtype) * resolution
    n = jnp.maximum(count, 1.0)
    mx, my = sx / n, sy / n
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
    mean = jnp.stack([mx + corner_x, my + corner_y], axis=-1)
    mean = jnp.where(valid[:, None], mean, 1.0e8)
    inv_cov = jnp.where(valid[:, None, None], inv_cov, 0.0)
    return NDTGrid(
        origin=origin, mean=mean, inv_cov=inv_cov, valid=valid,
        nx=nx, ny=ny, resolution=resolution,
    )


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
    """Single-device grid build: moments + finalize in one call.

    xy: [N,2], mask: [N], center: [2] — the window recenters on `center`
    every frame (the reference rebuilds its target grid per frame too,
    src/PoseEstimator.cpp:17-19).
    """
    origin = grid_origin(center, nx, ny, resolution)
    m = grid_moments(xy, mask, origin, nx, ny, resolution)
    return grid_finalize(m, origin, nx, ny, resolution, min_pts, eig_mult)
