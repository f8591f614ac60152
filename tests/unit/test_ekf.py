"""EKF fusion parity tests vs a float64 NumPy re-derivation of the
reference formulas (reference: src/PoseFuser.cpp:3-61)."""

import numpy as np
import jax.numpy as jnp

from ndt_slam_tpu.fuse import odometry_covariance, fuse_pose

D2R = np.pi / 180.0


def _np_odo_cov(odo, last_pose, last_cov, dt, cv, cw):
    v = np.hypot(odo[0], odo[1]) / dt
    w = odo[2] * D2R / dt
    th = last_pose[2] * D2R
    M = np.diag([cv * v * v, cw * w * w])
    A = np.array([[dt * np.cos(th), 0.0], [dt * np.sin(th), 0.0], [0.0, dt]])
    F = np.eye(3)
    F[0, 2] = -v * dt * np.sin(th)
    F[1, 2] = v * dt * np.cos(th)
    return F @ last_cov @ F.T + A @ M @ A.T


def test_odometry_covariance_matches_numpy():
    odo = np.array([0.4, 0.1, 6.0])
    last_pose = np.array([1.0, 2.0, 35.0])
    last_cov = np.array([[0.01, 0.001, 0.0],
                         [0.001, 0.02, 0.002],
                         [0.0, 0.002, 0.005]])
    dt, cv, cw = 0.5, 0.1, 0.5
    ref = _np_odo_cov(odo, last_pose, last_cov, dt, cv, cw)
    got = np.asarray(odometry_covariance(
        jnp.array(odo), jnp.array(last_pose), jnp.array(last_cov), dt, cv, cw
    ))
    assert np.allclose(got, ref, rtol=1e-5, atol=1e-8)


def test_fuse_pose_blend():
    odo = np.array([0.4, 0.0, 2.0])
    last_pose = np.array([0.0, 0.0, 0.0])
    last_cov = np.eye(3) * 1e-4
    pred = np.array([0.4, 0.0, 2.0])
    est = np.array([0.42, 0.02, 2.5])
    Q = np.eye(3) * 1e-4
    dt, cv, cw = 0.5, 0.1, 0.5

    fused, cov = fuse_pose(
        jnp.array(pred), jnp.array(est), jnp.array(odo),
        jnp.array(last_pose), jnp.array(last_cov), jnp.array(Q), dt, cv, cw,
    )
    fused, cov = np.asarray(fused), np.asarray(cov)

    # reference NumPy computation
    cov_hat = _np_odo_cov(odo, last_pose, last_cov, dt, cv, cw)
    K = cov_hat @ np.linalg.inv(Q + cov_hat)
    cov_ref = (np.eye(3) - K) @ cov_hat
    zh = np.array([est[0] - pred[0], est[1] - pred[1], (est[2] - pred[2]) * D2R])
    mu = K @ zh + np.array([pred[0], pred[1], pred[2] * D2R])
    fused_ref = np.array([mu[0], mu[1], mu[2] / D2R])

    assert np.allclose(fused, fused_ref, atol=1e-5)
    # fuse_pose adds a deliberate 1e-6*trace jitter to S for f32 stability
    assert np.allclose(cov, cov_ref, rtol=2e-3, atol=1e-9)
    # fused pose lies between prediction and measurement
    assert pred[0] <= fused[0] <= est[0]


def test_fuse_tight_measurement_wins():
    # huge odometry noise, tight NDT covariance -> fused ~ measurement
    odo = np.array([1.0, 0.0, 0.0])
    last_pose = np.zeros(3)
    last_cov = np.eye(3) * 10.0
    pred = np.array([1.0, 0.0, 0.0])
    est = np.array([1.3, -0.2, 5.0])
    Q = np.eye(3) * 1e-8
    fused, _ = fuse_pose(
        jnp.array(pred), jnp.array(est), jnp.array(odo),
        jnp.array(last_pose), jnp.array(last_cov), jnp.array(Q), 0.5, 0.1, 0.5,
    )
    assert np.allclose(np.asarray(fused), est, atol=1e-3)
