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
):
    """Kalman blend (reference: PoseFuser::fusePose). Returns
    (fused_pose_deg [3], cov [3,3])."""
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
    mu = K @ zh + mu_hat
    fused = jnp.stack([mu[0], mu[1], rad2deg(wrap_rad(mu[2]))])
    return fused, cov
