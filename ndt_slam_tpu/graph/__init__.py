from ndt_slam_tpu.graph.backend import GraphBackend
from ndt_slam_tpu.graph.keyframes import KeyframeStore
from ndt_slam_tpu.graph.loop_closure import (
    LoopVerifyOut, relative_pose_deg, verify_candidates,
)
from ndt_slam_tpu.graph.pose_graph import (
    PoseGraph, edge_residual, empty_graph, optimize,
)

__all__ = [
    "GraphBackend",
    "KeyframeStore",
    "LoopVerifyOut",
    "relative_pose_deg",
    "verify_candidates",
    "PoseGraph",
    "edge_residual",
    "empty_graph",
    "optimize",
]
