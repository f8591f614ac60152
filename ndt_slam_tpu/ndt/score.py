"""NDT score, gradient and Hessian for SE(2) registration.

Implements the Magnusson (2009) Gaussian-mixture NDT objective that the
reference consumes via pcl::NormalDistributionsTransform (reference:
include/ndt_slam/PoseEstimator.h:19-31; SURVEY.md §2.2). The problem
here is 3-DoF (tx, ty, theta), so the Hessian is a closed-form 3x3 and
the whole derivative pass is one fused vectorized sweep over
(points x neighbor cells) — no per-point loops, no scatter.

All inner algebra is written in component form (2-vectors and symmetric
2x2 matrices as separate arrays): it keeps every op on the VPU at full
float32 precision, independent of the TPU matmul precision default.

Objective (MINIMIZED): E(p) = sum_i sum_c d1 * exp(-d2/2 * q'·Sigma^-1·q),
q = T_p(x_i) - mu_c, with d1 < 0, so minimizing E maximizes the NDT
likelihood. The reference's "-Hessian" information-matrix convention
(src/PoseEstimator.cpp:52-64) corresponds directly to our Hessian of E.

Analytic derivatives are cross-checked against jax.grad/jax.hessian in
tests (an oracle the C++ reference never had).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ndt_slam_tpu.ndt.grid import NDTGrid


def gauss_constants(resolution: float, outlier_ratio: float = 0.55):
    """Gaussian-mixture constants d1, d2 (PCL's gauss_d1_/gauss_d2_,
    adapted to 2D: the uniform-outlier density uses resolution^2)."""
    c1 = 10.0 * (1.0 - outlier_ratio)
    c2 = outlier_ratio / (resolution ** 2)
    d3 = -math.log(c2)
    d1 = -math.log(c1 + c2) - d3
    d2 = -2.0 * math.log((-math.log(c1 * math.exp(-0.5) + c2) - d3) / d1)
    return float(d1), float(d2)


def _neighbor_offsets(radius: int):
    return [
        (dx, dy)
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
    ]


def _gather_cells(grid: NDTGrid, cx, cy, radius: int):
    """Gather neighbor-cell stats for each point, in component form.

    Returns (mx, my, b00, b01, b11, valid), each [N, K] for the K cells
    of the (2r+1)^2 neighborhood (b* = inverse covariance entries).
    """
    mx, my, b00, b01, b11, valids = [], [], [], [], [], []
    for dx, dy in _neighbor_offsets(radius):
        nxi = cx + dx
        nyi = cy + dy
        inb = (nxi >= 0) & (nxi < grid.nx) & (nyi >= 0) & (nyi < grid.ny)
        cid = jnp.clip(nxi * grid.ny + nyi, 0, grid.nx * grid.ny - 1)
        mx.append(grid.mean[cid, 0])
        my.append(grid.mean[cid, 1])
        b00.append(grid.inv_cov[cid, 0, 0])
        b01.append(grid.inv_cov[cid, 0, 1])
        b11.append(grid.inv_cov[cid, 1, 1])
        valids.append(grid.valid[cid] & inb)
    stk = lambda xs: jnp.stack(xs, axis=1)
    return stk(mx), stk(my), stk(b00), stk(b01), stk(b11), stk(valids)


def _transform(pose_rad, xy):
    c, s = jnp.cos(pose_rad[2]), jnp.sin(pose_rad[2])
    x = c * xy[:, 0] - s * xy[:, 1] + pose_rad[0]
    y = s * xy[:, 0] + c * xy[:, 1] + pose_rad[1]
    return x, y, c, s


def _point_cell_terms(pose_rad, xy, mask, grid: NDTGrid, d2: float, radius: int):
    """Shared terms: returns dict of [N]/[N,K] component arrays."""
    px, py, c, s = _transform(pose_rad, xy)
    rel_x = (px - grid.origin[0]) / grid.resolution
    rel_y = (py - grid.origin[1]) / grid.resolution
    cx = jnp.floor(rel_x).astype(jnp.int32)
    cy = jnp.floor(rel_y).astype(jnp.int32)
    mx, my, b00, b01, b11, valid = _gather_cells(grid, cx, cy, radius)

    qx = px[:, None] - mx                   # [N,K]
    qy = py[:, None] - my
    bqx = b00 * qx + b01 * qy               # Sigma^-1 q
    bqy = b01 * qx + b11 * qy
    md = qx * bqx + qy * bqy                # Mahalanobis^2
    w = (valid & mask[:, None]).astype(xy.dtype)
    e = jnp.exp(-0.5 * d2 * jnp.minimum(md, 50.0 / d2))
    return dict(
        px=px, py=py, c=c, s=s,
        qx=qx, qy=qy, bqx=bqx, bqy=bqy,
        b00=b00, b01=b01, b11=b11,
        w=w, e=e,
    )


def ndt_negative_score(
    pose_rad, xy, mask, grid: NDTGrid, d1: float, d2: float, radius: int = 1
):
    """E(p): scalar objective (to minimize). Differentiable in pose_rad."""
    t = _point_cell_terms(pose_rad, xy, mask, grid, d2, radius)
    return jnp.sum(t["w"] * d1 * t["e"])


def ndt_score_grad_hess(
    pose_rad, xy, mask, grid: NDTGrid, d1: float, d2: float, radius: int = 1
):
    """Fused (E, grad[3], hess[3,3], matched) pass.

    matched = number of (point, cell) pairs contributing, used for the
    converged/degenerate diagnostics (empty grid -> reject like the
    reference's hasConverged()==0 branch, src/PoseEstimator.cpp:44-46).
    """
    t = _point_cell_terms(pose_rad, xy, mask, grid, d2, radius)
    w, e = t["w"], t["e"]
    bqx, bqy = t["bqx"], t["bqy"]
    b00, b01, b11 = t["b00"], t["b01"], t["b11"]

    E = jnp.sum(w * d1 * e)
    matched = jnp.sum(w)

    # dE/dq per (point, cell): coef * Bq with coef = -d1*d2*w*e.
    coef = (-d1 * d2) * w * e               # [N,K]
    gqx = coef * bqx
    gqy = coef * bqy
    gqx_s = jnp.sum(gqx, axis=1)            # [N]
    gqy_s = jnp.sum(gqy, axis=1)

    # Jacobian of the transformed point w.r.t. (tx, ty, th):
    # J = [[1, 0, a], [0, 1, b]], a = -s*x - c*y, b = c*x - s*y.
    c, s = t["c"], t["s"]
    a = -s * xy[:, 0] - c * xy[:, 1]        # [N]
    b = c * xy[:, 0] - s * xy[:, 1]

    g0 = jnp.sum(gqx_s)
    g1 = jnp.sum(gqy_s)
    g2 = jnp.sum(a * gqx_s + b * gqy_s)
    grad = jnp.stack([g0, g1, g2])

    # Hq = coef * (B - d2 * Bq Bq') per (point, cell), symmetric 2x2.
    hq00 = coef * (b00 - d2 * bqx * bqx)
    hq01 = coef * (b01 - d2 * bqx * bqy)
    hq11 = coef * (b11 - d2 * bqy * bqy)
    hq00_s = jnp.sum(hq00, axis=1)          # [N]
    hq01_s = jnp.sum(hq01, axis=1)
    hq11_s = jnp.sum(hq11, axis=1)

    h00 = jnp.sum(hq00_s)
    h01 = jnp.sum(hq01_s)
    h11 = jnp.sum(hq11_s)
    h02 = jnp.sum(a * hq00_s + b * hq01_s)
    h12 = jnp.sum(a * hq01_s + b * hq11_s)
    h22_rot = jnp.sum(a * a * hq00_s + 2.0 * a * b * hq01_s + b * b * hq11_s)
    # Curvature of the transform itself: d2x'/dth2 = -(x' - t).
    d2x = -(t["px"] - pose_rad[0])
    d2y = -(t["py"] - pose_rad[1])
    h22_curv = jnp.sum(gqx_s * d2x + gqy_s * d2y)
    h22 = h22_rot + h22_curv

    hess = jnp.stack(
        [
            jnp.stack([h00, h01, h02]),
            jnp.stack([h01, h11, h12]),
            jnp.stack([h02, h12, h22]),
        ]
    )
    return E, grad, hess, matched
