from ndt_slam_tpu.core.angles import add_deg, sub_deg, wrap_deg, deg2rad, rad2deg
from ndt_slam_tpu.core.pose2 import (
    rot2,
    cal_motion,
    cal_global_motion,
    cal_pred_pose,
    global_points,
    relative_points,
    pose_deg_to_rad,
    pose_rad_to_deg,
)
from ndt_slam_tpu.core.points import PointBuffer, pad_points, concat_buffers

__all__ = [
    "add_deg", "sub_deg", "wrap_deg", "deg2rad", "rad2deg",
    "rot2", "cal_motion", "cal_global_motion", "cal_pred_pose",
    "global_points", "relative_points", "pose_deg_to_rad", "pose_rad_to_deg",
    "PointBuffer", "pad_points", "concat_buffers",
]
