from ndt_slam_tpu.ndt.grid import NDTGrid, build_grid
from ndt_slam_tpu.ndt.score import (
    gauss_constants,
    ndt_negative_score,
    ndt_score_grad_hess,
)
from ndt_slam_tpu.ndt.solve import NDTResult, align
from ndt_slam_tpu.ndt.fitness import fitness_score

__all__ = [
    "NDTGrid", "build_grid",
    "gauss_constants", "ndt_negative_score", "ndt_score_grad_hess",
    "NDTResult", "align", "fitness_score",
]
