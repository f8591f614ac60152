from ndt_slam_tpu.mapping.voxel import voxel_filter
from ndt_slam_tpu.mapping.dynamic import (
    occupancy_diff_mask,
    keep_far_from_mask,
    process_interior_scan,
)
from ndt_slam_tpu.mapping.pointcloud_map import PointCloudMap, Submap

__all__ = [
    "voxel_filter",
    "occupancy_diff_mask", "keep_far_from_mask", "process_interior_scan",
    "PointCloudMap", "Submap",
]
