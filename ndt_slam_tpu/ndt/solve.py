"""Newton solve for NDT registration under lax.while_loop.

Replaces the reference's hot loop inside pcl::NDT::align (reference:
src/PoseEstimator.cpp:28; SURVEY.md §3.3): up to `max_iterations`
Newton steps on the 3-DoF objective, with

- a Levenberg ridge keyed off the smallest Hessian eigenvalue (the
  3x3 eigensolve is negligible next to the N-point derivative pass),
- step-norm clamping to `step_size` plus a *batched* backtracking line
  search: all candidate step lengths are scored in one vmapped pass —
  the TPU-friendly stand-in for PCL's sequential More-Thuente search
  (SURVEY.md §7.3 item 2),
- termination when the applied step norm drops below `trans_eps`
  (PCL's transformation epsilon).

Everything is fixed-shape; the while_loop exits early on convergence.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ndt_slam_tpu.core.vma import cast_to_vma, vma_of
from ndt_slam_tpu.ndt.compact import (
    CompactGrid,
    ndt_negative_score_compact,
    ndt_score_grad_hess_compact,
)
from ndt_slam_tpu.ndt.grid import NDTGrid
from ndt_slam_tpu.ndt.score import ndt_negative_score, ndt_score_grad_hess

# Candidate step-length scales evaluated in parallel each iteration.
# NB: a host (numpy) constant, NOT jnp — a module-level jnp.array lives
# on the default device and jit lowering must fetch its value back to
# embed it in MLIR, which stalls for minutes over a remote-TPU tunnel.
_LS_SCALES = np.array([1.0, 0.5, 0.25, 0.1, 0.04, 0.015], dtype=np.float32)


def _sym3_eig_bounds(H):
    """(min_eig, max_abs_eig) of a symmetric 3x3, closed form (Smith's
    trigonometric method). Replaces `jnp.linalg.eigvalsh` in the Newton
    body: on TPU the general eigensolver lowers to an iterative QR loop
    that serializes ~50 us per Newton iteration for a 3x3 whose bounds
    we need only for the Levenberg ridge; the closed form is a handful
    of VPU ops and fuses into the surrounding program."""
    q = (H[0, 0] + H[1, 1] + H[2, 2]) / 3.0
    p1 = H[0, 1] ** 2 + H[0, 2] ** 2 + H[1, 2] ** 2
    p2 = ((H[0, 0] - q) ** 2 + (H[1, 1] - q) ** 2 + (H[2, 2] - q) ** 2
          + 2.0 * p1)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, 1e-20)
    B = (H - q * jnp.eye(3, dtype=H.dtype)) / safe_p
    detB = (
        B[0, 0] * (B[1, 1] * B[2, 2] - B[1, 2] * B[2, 1])
        - B[0, 1] * (B[1, 0] * B[2, 2] - B[1, 2] * B[2, 0])
        + B[0, 2] * (B[1, 0] * B[2, 1] - B[1, 1] * B[2, 0])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_max = q + 2.0 * p * jnp.cos(phi)
    e_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    # p == 0: H is q*I — all eigenvalues equal q
    e_max = jnp.where(p2 > 0.0, e_max, q)
    e_min = jnp.where(p2 > 0.0, e_min, q)
    return e_min, jnp.maximum(jnp.abs(e_min), jnp.abs(e_max))


def _solve3(A, b):
    """x = A^-1 b for 3x3 via the adjugate (Cramer) — branch-free VPU
    ops instead of the LU path, fusing with the Newton body."""
    c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
    c01 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
    c02 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
    det = A[0, 0] * c00 + A[0, 1] * c01 + A[0, 2] * c02
    c10 = A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]
    c11 = A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]
    c12 = A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]
    c20 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
    c21 = A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]
    c22 = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    adjT = jnp.stack([
        jnp.stack([c00, c10, c20]),
        jnp.stack([c01, c11, c21]),
        jnp.stack([c02, c12, c22]),
    ])
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    return inv_det * (adjT @ b)


class NDTResult(NamedTuple):
    pose_rad: jnp.ndarray   # [3] converged pose (tx, ty, th_rad)
    iterations: jnp.ndarray  # int32
    converged: jnp.ndarray  # bool: grid/source were usable
    objective: jnp.ndarray  # final E (negative of PCL's score sum)
    hessian: jnp.ndarray    # [3,3] Hessian of E at the final pose
    matched: jnp.ndarray    # matched (point,cell) pairs at final pose


def align(
    init_pose_rad: jnp.ndarray,
    src_xy: jnp.ndarray,
    src_mask: jnp.ndarray,
    grid: NDTGrid,
    d1: float,
    d2: float,
    max_iterations: int = 35,
    step_size: float = 0.1,
    trans_eps: float = 0.01,
    radius: int = 1,
    axis_name: str | None = None,
    use_pallas: bool = False,
) -> NDTResult:
    """Newton NDT solve. With `axis_name` set (inside shard_map), source
    points are sharded along that mesh axis: every reduction (E, grad,
    Hessian, matched, line-search scores) is psum'd so all devices run
    the identical Newton iteration in lockstep — the SPMD pattern."""

    def _reduce(*xs):
        if axis_name is None:
            return xs
        return tuple(jax.lax.psum(x, axis_name) for x in xs)

    # Engine dispatch: CompactGrid -> gather-free [N,K] broadcast engine
    # (ndt/compact.py), optionally as fused Pallas kernels
    # (ndt/pallas_kernels.py — VMEM-resident pair pass, the TPU-fast
    # path); NDTGrid -> dense-window neighbor-gather engine (score.py).
    if isinstance(grid, CompactGrid) and use_pallas:
        from ndt_slam_tpu.ndt.pallas_kernels import (
            ndt_score_grad_hess_pallas, ndt_scores_pallas,
        )
        _score = None
        _sgh = ndt_score_grad_hess_pallas

        def score_batch(poses):
            s = ndt_scores_pallas(
                poses, src_xy, src_mask, grid, d1, d2, radius
            )
            (s,) = _reduce(s)
            return s
    else:
        if isinstance(grid, CompactGrid):
            _score = ndt_negative_score_compact
            _sgh = ndt_score_grad_hess_compact
        else:
            _score = ndt_negative_score
            _sgh = ndt_score_grad_hess

        def score_at(pose):
            return _score(pose, src_xy, src_mask, grid, d1, d2, radius)

        def score_batch(poses):
            s = jax.vmap(score_at)(poses)
            (s,) = _reduce(s)
            return s

    def body(state):
        pose, _prev_step, it, done = state
        E, g, H, matched = _sgh(
            pose, src_xy, src_mask, grid, d1, d2, radius
        )
        E, g, H, matched = _reduce(E, g, H, matched)

        # Levenberg ridge: make H positive definite AND well-conditioned
        # in float32 (a bare -lambda_min shift is singular at f32 and
        # the solve returns non-finite). Far from the optimum the step
        # norm is clamped anyway, so the extra damping only rotates the
        # direction toward the gradient. Closed-form 3x3 bounds + Cramer
        # solve keep the whole body VPU-fused (no iterative eigensolver
        # serializing the Newton loop — see _sym3_eig_bounds).
        e_min, e_absmax = _sym3_eig_bounds(H)
        abs_max = jnp.maximum(e_absmax, 1e-6)
        lam = jnp.where(
            e_min < 1e-3 * abs_max,
            -jnp.minimum(e_min, 0.0) + 1e-2 * abs_max,
            0.0,
        )
        Hp = H + lam * jnp.eye(3, dtype=H.dtype)
        step = -_solve3(Hp, g)
        step = jnp.where(jnp.isfinite(step), step, 0.0)

        def clamp(v):
            nrm = jnp.linalg.norm(v)
            return v * (jnp.minimum(nrm, step_size) / jnp.maximum(nrm, 1e-12))

        # Batched line search over two directions (damped Newton and
        # steepest descent — the fallback when H is badly conditioned
        # far from the optimum), all candidates scored in one pass.
        dirs = jnp.stack([clamp(step), clamp(-g)])            # [2,3]
        cand_steps = (_LS_SCALES[:, None, None] * dirs[None, :, :]).reshape(-1, 3)
        cand = pose[None, :] + cand_steps
        Ec = score_batch(cand)
        best = jnp.argmin(Ec)
        improved = Ec[best] < E
        applied = jnp.where(improved, 1.0, 0.0) * cand_steps[best]
        new_pose = pose + applied

        step_norm = jnp.linalg.norm(applied)
        now_done = (~improved) | (step_norm < trans_eps) | (matched < 1.0)
        return new_pose, step_norm, it + 1, done | now_done

    def cond(state):
        _pose, _sn, it, done = state
        return (~done) & (it < max_iterations)

    pose0 = init_pose_rad.astype(jnp.float32)
    # Inside shard_map the while_loop carry must carry the union of the
    # inputs' varying-axes (vma) or the carry types won't match the body
    # output (e.g. batched registration: psum over the point axis leaves
    # results varying over the batch axis). No-op outside shard_map.
    gref = grid.mx if isinstance(grid, CompactGrid) else grid.mean
    vma = vma_of(pose0, src_xy, gref)
    # psum over axis_name strips that axis from every body output, so
    # the carry must not be varying over it (unless the init pose is).
    if axis_name is not None:
        vma -= {axis_name}
        vma |= vma_of(pose0)
    cast = lambda x: cast_to_vma(x, vma)
    state = (
        cast(pose0), cast(jnp.float32(1e9)),
        cast(jnp.int32(0)), cast(jnp.bool_(False)),
    )
    pose, _sn, it, _done = jax.lax.while_loop(cond, body, state)

    # Final derivatives at the converged pose (feeds the NDT covariance,
    # reference: src/PoseEstimator.cpp:52-64).
    E, g, H, matched = _sgh(
        pose, src_xy, src_mask, grid, d1, d2, radius
    )
    E, g, H, matched = _reduce(E, g, H, matched)
    n_src = jnp.sum(src_mask.astype(jnp.float32))
    (n_src,) = _reduce(n_src)
    usable = (matched >= 1.0) & (n_src >= 1.0) & jnp.all(jnp.isfinite(pose))
    return NDTResult(
        pose_rad=pose,
        iterations=it,
        converged=usable,
        objective=E,
        hessian=H,
        matched=matched,
    )
