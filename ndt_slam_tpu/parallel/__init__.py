from ndt_slam_tpu.parallel.mesh import balanced_factors, make_mesh
from ndt_slam_tpu.parallel.register import (
    FrameStepOut,
    RegisterOut,
    make_batch_register,
    make_sharded_frame_step,
    make_sharded_register,
)

__all__ = [
    "balanced_factors",
    "make_mesh",
    "FrameStepOut",
    "RegisterOut",
    "make_batch_register",
    "make_sharded_frame_step",
    "make_sharded_register",
]
