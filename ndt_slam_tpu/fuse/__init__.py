from ndt_slam_tpu.fuse.ekf import odometry_covariance, fuse_pose

__all__ = ["odometry_covariance", "fuse_pose"]
