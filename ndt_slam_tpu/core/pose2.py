"""SE(2) pose algebra on JAX arrays.

A pose is a length-3 array [tx, ty, th_deg] (degrees, like the
reference's Pose2D; reference: include/ndt_slam/Pose2D.h:11-70,
src/Pose2D.cpp:5-59). Rotation convention R(th) = [[c,-s],[s,c]]
(reference: Pose2D::calRmat).

Everything is a pure function; no cached rotation matrices — XLA CSEs
the sin/cos. Functions batch over leading dimensions where noted.
"""

from __future__ import annotations

import jax.numpy as jnp

from ndt_slam_tpu.core.angles import add_deg, sub_deg, deg2rad, rad2deg, wrap_rad


def rot2(th_deg):
    """2x2 rotation matrix (batched over leading dims of th_deg)."""
    a = deg2rad(th_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def _cs(th_deg):
    a = deg2rad(th_deg)
    return jnp.cos(a), jnp.sin(a)


def cal_motion(cur_pose, prev_pose):
    """Relative motion cur⊖prev expressed in prev's robot frame.

    Reference: Pose2D::calMotion (src/Pose2D.cpp:5-14).

    All small-vector rotations here are written in component form (VPU
    elementwise ops) rather than matmuls, so precision never depends on
    the TPU matmul default (bf16 passes would corrupt map-scale
    coordinates).
    """
    dx = cur_pose[..., 0] - prev_pose[..., 0]
    dy = cur_pose[..., 1] - prev_pose[..., 1]
    c, s = _cs(prev_pose[..., 2])
    tx = c * dx + s * dy          # R^T d
    ty = -s * dx + c * dy
    th = sub_deg(cur_pose[..., 2], prev_pose[..., 2])
    return jnp.stack([tx, ty, th], axis=-1)


def cal_global_motion(cur_pose, prev_pose):
    """World-frame delta cur - prev (reference: Pose2D::calGlobalMotion)."""
    dx = cur_pose[..., 0] - prev_pose[..., 0]
    dy = cur_pose[..., 1] - prev_pose[..., 1]
    th = sub_deg(cur_pose[..., 2], prev_pose[..., 2])
    return jnp.stack([dx, dy, th], axis=-1)


def cal_pred_pose(motion, last_pose):
    """Compose robot-frame motion onto last_pose.

    Reference: Pose2D::calPredPose (src/Pose2D.cpp:28-37).
    """
    c, s = _cs(last_pose[..., 2])
    tx = c * motion[..., 0] - s * motion[..., 1] + last_pose[..., 0]
    ty = s * motion[..., 0] + c * motion[..., 1] + last_pose[..., 1]
    th = add_deg(last_pose[..., 2], motion[..., 2])
    return jnp.stack([tx, ty, th], axis=-1)


def global_points(pose, pts):
    """Transform local points [N,2] into the world frame of `pose`.

    Reference: Pose2D::globalPoint (src/Pose2D.cpp:55-59).
    """
    c, s = _cs(pose[..., 2:3])  # keep a trailing axis to broadcast over N
    x = c * pts[..., 0] - s * pts[..., 1] + pose[..., 0:1]
    y = s * pts[..., 0] + c * pts[..., 1] + pose[..., 1:2]
    return jnp.stack([x, y], axis=-1)


def relative_points(pose, pts):
    """Transform world points [N,2] into the local frame of `pose`.

    Reference: Pose2D::relativePoint (src/Pose2D.cpp:46-52).
    """
    c, s = _cs(pose[..., 2:3])
    dx = pts[..., 0] - pose[..., 0:1]
    dy = pts[..., 1] - pose[..., 1:2]
    return jnp.stack([c * dx + s * dy, -s * dx + c * dy], axis=-1)


def pose_deg_to_rad(pose_deg):
    """[tx, ty, th_deg] -> [tx, ty, th_rad] (for the NDT/fusion internals)."""
    return jnp.stack(
        [pose_deg[..., 0], pose_deg[..., 1], deg2rad(pose_deg[..., 2])], axis=-1
    )


def pose_rad_to_deg(pose_rad):
    return jnp.stack(
        [pose_rad[..., 0], pose_rad[..., 1], rad2deg(wrap_rad(pose_rad[..., 2]))],
        axis=-1,
    )


def distance(pose):
    """Translation norm (reference: Pose2D::calDistance)."""
    return jnp.sqrt(pose[..., 0] ** 2 + pose[..., 1] ** 2)
