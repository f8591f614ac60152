"""EKF-style fusion of odometry prediction with the NDT measurement.

Replicates the reference PoseFuser math (reference: src/PoseFuser.cpp:
3-61; SURVEY.md §2 item 6) as pure 3x3 closed-form JAX:

predict:  cov_hat = F·lastCov·Fᵀ + A·M·Aᵀ,
          M = diag(coe_vel·v², coe_omega·ω²), v = |odo t|/Δt, ω = odo θ/Δt
update:   K = cov_hat (Q + cov_hat)⁻¹,  cov = (I−K) cov_hat,
          μ = μ_hat + K·(z − h),  innovation angle wrapped.

Covariances live in (m, m, rad) units; poses cross the API in degrees
(reference convention) and are converted at this boundary.
"""

from __future__ import annotations

import jax.numpy as jnp

from ndt_slam_tpu.core.angles import deg2rad, rad2deg, sub_deg, wrap_rad


def odometry_covariance(
    odo_motion_deg: jnp.ndarray,
    last_pose_deg: jnp.ndarray,
    last_cov: jnp.ndarray,
    del_time: float,
    coe_vel: float,
    coe_omega: float,
) -> jnp.ndarray:
    """Propagated covariance cov_hat (reference: PoseFuser::calOdometryCovariance)."""
    v = jnp.sqrt(odo_motion_deg[0] ** 2 + odo_motion_deg[1] ** 2) / del_time
    omega = deg2rad(odo_motion_deg[2]) / del_time
    th = deg2rad(last_pose_deg[2])
    c, s = jnp.cos(th), jnp.sin(th)

    M = jnp.diag(jnp.stack([coe_vel * v * v, coe_omega * omega * omega]))
    zero = jnp.zeros_like(v)
    one = jnp.ones_like(v)
    A = jnp.stack(
        [
            jnp.stack([del_time * c, zero]),
            jnp.stack([del_time * s, zero]),
            jnp.stack([zero, del_time * one]),
        ]
    )
    F = jnp.stack(
        [
            jnp.stack([one, zero, -v * del_time * s]),
            jnp.stack([zero, one, v * del_time * c]),
            jnp.stack([zero, zero, one]),
        ]
    )

    return F @ last_cov @ F.T + A @ M @ A.T


def fuse_pose(
    pred_pose_deg: jnp.ndarray,
    est_pose_deg: jnp.ndarray,
    odo_motion_deg: jnp.ndarray,
    last_pose_deg: jnp.ndarray,
    last_cov: jnp.ndarray,
    q_mat: jnp.ndarray,
    del_time: float,
    coe_vel: float,
    coe_omega: float,
    innov_proj: jnp.ndarray | None = None,
):
    """Kalman blend (reference: PoseFuser::fusePose). Returns
    (fused_pose_deg [3], cov [3,3]). `innov_proj` (optional [3,3])
    projects the innovation before the gain is applied — used by
    gate_and_fuse to drop components along degenerate NDT Hessian
    directions (those follow the odometry prediction instead)."""
    cov_hat = odometry_covariance(
        odo_motion_deg, last_pose_deg, last_cov, del_time, coe_vel, coe_omega
    )
    mu_hat = jnp.stack(
        [pred_pose_deg[0], pred_pose_deg[1], deg2rad(pred_pose_deg[2])]
    )

    # Symmetrize + jitter the innovation covariance before solving:
    # both terms can sit near the f32 noise floor (~1e-6 m^2) and a raw
    # inverse of a noise-indefinite S produces unbounded gains. The
    # reference does this math in f64 Eigen (src/PoseFuser.cpp:19),
    # which masks the issue; at f32 the conditioning must be explicit.
    S = q_mat + cov_hat
    S = 0.5 * (S + S.T)
    S = S + (1e-6 * jnp.trace(S) + 1e-9) * jnp.eye(3, dtype=S.dtype)
    K = jnp.linalg.solve(S.T, cov_hat.T).T
    cov = (jnp.eye(3, dtype=cov_hat.dtype) - K) @ cov_hat
    cov = 0.5 * (cov + cov.T)

    zh = jnp.stack(
        [
            est_pose_deg[0] - pred_pose_deg[0],
            est_pose_deg[1] - pred_pose_deg[1],
            deg2rad(sub_deg(est_pose_deg[2], pred_pose_deg[2])),
        ]
    )
    if innov_proj is not None:
        zh = innov_proj @ zh
    mu = K @ zh + mu_hat
    fused = jnp.stack([mu[0], mu[1], rad2deg(wrap_rad(mu[2]))])
    return fused, cov


def gate_and_fuse(
    cfg,
    pred_pose_deg: jnp.ndarray,
    est_pose_deg: jnp.ndarray,
    hessian: jnp.ndarray,
    cost: jnp.ndarray,
    odo_motion_deg: jnp.ndarray,
    last_pose_deg: jnp.ndarray,
    last_cov: jnp.ndarray,
):
    """The complete accept/reject + fusion tail of the per-frame step:
    NDT covariance repaired from the objective Hessian, fitness +
    innovation gates, Kalman fuse on accept / odometry propagation on
    reject (reference: src/ScanMatcher.cpp:50-66 +
    src/PoseEstimator.cpp:52-64; conditioning notes inline).

    Shared — single source of truth — by the single-device frame step
    (pipeline/frontend._registration_step) and the multi-host
    sequential step (parallel/register.make_sharded_sequential_step).
    Returns (fused_pose_deg [3], cov [3,3], accept bool).
    """
    # --- NDT covariance Q = H^-1 * coe. Conscious fix over the
    #     reference (SURVEY.md §6.3 item 3): the reference inverts H
    #     unconditionally, feeding an indefinite Q into the Kalman
    #     update when the Hessian isn't PD. Here Q is repaired by
    #     flooring the curvature eigenvalues.
    H = hessian
    H = jnp.where(jnp.all(jnp.isfinite(H)), H, jnp.eye(3, dtype=H.dtype))
    evals, evecs = jnp.linalg.eigh(H)
    inv_e = cfg.coe_ndt_cov / jnp.clip(evals, 1e-3, None)
    # Cap Q's variances into [1e-6, 1e-2] (1 mm .. 10 cm std): a saddle
    # Hessian reconstructed next to ~1e-6 confident directions is so
    # ill-conditioned that f32 reconstruction noise makes Q indefinite
    # and the Kalman gain explodes (observed: |K| ~ 45, a 2.8 m fused
    # teleport). Bounded conditioning keeps Q PSD to f32 accuracy.
    inv_e = jnp.clip(inv_e, 1e-6, 1e-2)
    q_mat = (evecs * inv_e[None, :]) @ evecs.T

    # --- Degenerate-direction projection (round 5). The Q cap above
    #     is a CONDITIONING floor, not a belief: along a Hessian
    #     eigendirection with (relatively) ~zero curvature — the
    #     corridor axis in a featureless hallway — the NDT pose carries
    #     no information, yet capped-Q fusion keeps pulling the fused
    #     pose toward it at 10 cm-std confidence. That is exactly the
    #     slow corridor-slide failure (killian_robot: a 5 m bulge worse
    #     than raw odometry, unfixable afterwards because the
    #     degeneracy-aware loop edges correctly carry no information
    #     along the same axis). Instead of trusting a capped variance,
    #     the innovation is PROJECTED off the degenerate
    #     eigendirections, so those components follow odometry — the
    #     same spectrum rule the loop-edge information matrices already
    #     apply (graph/backend._resolve_verify).
    ratio = cfg.fuse_degenerate_ratio
    if ratio > 0.0:
        wmax = jnp.maximum(evals[-1], 1e-9)  # eigh: ascending order
        keep = (evals > ratio * wmax).astype(H.dtype)
        innov_proj = (evecs * keep[None, :]) @ evecs.T
    else:
        innov_proj = jnp.eye(3, dtype=H.dtype)

    # innovation gate vs the prediction (SlamConfig.max_innovation_*)
    innov_t = jnp.hypot(
        est_pose_deg[0] - pred_pose_deg[0],
        est_pose_deg[1] - pred_pose_deg[1],
    )
    innov_r = jnp.abs(sub_deg(est_pose_deg[2], pred_pose_deg[2]))
    plausible = (
        (innov_t <= cfg.max_innovation_trans)
        & (innov_r <= cfg.max_innovation_rot)
    )
    successful = (cost <= cfg.score_thre) & plausible

    fused_k, cov_k = fuse_pose(
        pred_pose_deg, est_pose_deg, odo_motion_deg, last_pose_deg,
        last_cov, q_mat, cfg.del_time, cfg.coe_vel, cfg.coe_omega,
        innov_proj=innov_proj,
    )
    cov_odo = odometry_covariance(
        odo_motion_deg, last_pose_deg, last_cov,
        cfg.del_time, cfg.coe_vel, cfg.coe_omega,
    )
    # The fused pose must also stay within the innovation gate — a
    # pathological gain can move it far even when est is plausible.
    fused_t = jnp.hypot(
        fused_k[0] - pred_pose_deg[0], fused_k[1] - pred_pose_deg[1]
    )
    fused_r = jnp.abs(sub_deg(fused_k[2], pred_pose_deg[2]))
    fused_ok = (
        (fused_t <= cfg.max_innovation_trans)
        & (fused_r <= cfg.max_innovation_rot)
        & jnp.all(jnp.isfinite(fused_k))
    )
    accept = successful & fused_ok
    fused = jnp.where(accept, fused_k, pred_pose_deg)
    cov = jnp.where(accept, cov_k, cov_odo)
    return fused, cov, accept
