"""Unit tests for L1 core: angle wrap, SE(2) algebra, point buffers.

Parity values hand-computed from the reference formulas
(reference: src/MyUtil.cpp:4-23, src/Pose2D.cpp:5-59).
"""

import numpy as np
import jax.numpy as jnp

from ndt_slam_tpu.core import (
    add_deg, sub_deg, wrap_deg,
    rot2, cal_motion, cal_global_motion, cal_pred_pose,
    global_points, relative_points,
    PointBuffer, pad_points, concat_buffers,
)
from ndt_slam_tpu.core.points import compact


def test_wrap_deg():
    assert float(wrap_deg(0.0)) == 0.0
    assert float(wrap_deg(180.0)) == -180.0   # [-180, 180)
    assert float(wrap_deg(-180.0)) == -180.0
    assert float(wrap_deg(190.0)) == -170.0
    assert float(wrap_deg(-190.0)) == 170.0
    assert float(wrap_deg(540.0)) == -180.0


def test_add_sub_deg():
    assert float(add_deg(170.0, 20.0)) == -170.0
    assert float(sub_deg(-170.0, 20.0)) == 170.0
    assert abs(float(add_deg(10.0, 20.0)) - 30.0) < 1e-6


def test_rot2_convention():
    R = np.asarray(rot2(jnp.float32(90.0)))
    # R(90) = [[0,-1],[1,0]] (reference: Pose2D::calRmat)
    assert np.allclose(R, [[0.0, -1.0], [1.0, 0.0]], atol=1e-6)


def test_motion_roundtrip():
    prev = jnp.array([1.0, 2.0, 30.0])
    cur = jnp.array([1.5, 2.7, 45.0])
    motion = cal_motion(cur, prev)
    # compose back: pred(prev, motion) == cur
    rec = cal_pred_pose(motion, prev)
    assert np.allclose(np.asarray(rec), np.asarray(cur), atol=1e-5)


def test_motion_hand_value():
    # prev at origin facing +x: motion == global delta
    prev = jnp.array([0.0, 0.0, 0.0])
    cur = jnp.array([2.0, 1.0, 10.0])
    m = np.asarray(cal_motion(cur, prev))
    assert np.allclose(m, [2.0, 1.0, 10.0], atol=1e-6)
    # prev facing +y: robot-frame x is world y
    prev = jnp.array([0.0, 0.0, 90.0])
    m = np.asarray(cal_motion(cur, prev))
    assert np.allclose(m, [1.0, -2.0, -80.0], atol=1e-5)


def test_global_motion():
    prev = jnp.array([1.0, 1.0, 170.0])
    cur = jnp.array([2.0, 3.0, -170.0])
    gm = np.asarray(cal_global_motion(cur, prev))
    assert np.allclose(gm, [1.0, 2.0, 20.0], atol=1e-5)


def test_point_transforms_roundtrip():
    pose = jnp.array([1.0, -2.0, 37.0])
    pts = jnp.array([[0.5, 0.1], [-1.0, 2.0], [3.0, -4.0]])
    g = global_points(pose, pts)
    back = relative_points(pose, g)
    assert np.allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_pad_and_compact():
    buf = pad_points(np.array([[1.0, 2.0], [3.0, 4.0]]), 8)
    assert int(buf.count()) == 2
    # scramble the mask, compact puts valid first
    mask = buf.mask.at[0].set(False).at[5].set(True)
    xy = buf.xy.at[5].set(jnp.array([9.0, 9.0]))
    c = compact(PointBuffer(xy, mask))
    assert int(c.count()) == 2
    got = np.asarray(c.xy[:2])
    assert np.allclose(got, [[3.0, 4.0], [9.0, 9.0]])


def test_concat_buffers():
    a = pad_points(np.array([[1.0, 1.0]]), 4)
    b = pad_points(np.array([[2.0, 2.0], [3.0, 3.0]]), 4)
    c = concat_buffers(a, b, 8)
    assert int(c.count()) == 3
    assert np.allclose(np.asarray(c.xy[:3]), [[1, 1], [2, 2], [3, 3]])
