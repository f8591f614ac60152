from ndt_slam_tpu.io.simulate import World, simulate_sequence, default_world
from ndt_slam_tpu.io.tsukuba import read_tsukuba_log, write_tsukuba_log
from ndt_slam_tpu.io.carmen import read_carmen_log
from ndt_slam_tpu.io.pcd import save_pcd, load_pcd
from ndt_slam_tpu.io.traj import save_poses_reference_format, save_poses_full

__all__ = [
    "World", "simulate_sequence", "default_world",
    "read_tsukuba_log", "write_tsukuba_log", "read_carmen_log",
    "save_pcd", "load_pcd",
    "save_poses_reference_format", "save_poses_full",
]
