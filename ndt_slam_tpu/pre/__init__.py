from ndt_slam_tpu.pre.resample import resample_points_np, resample_points_jax

__all__ = ["resample_points_np", "resample_points_jax"]
