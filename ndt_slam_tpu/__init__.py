"""ndt_slam_tpu — TPU-native 2D LiDAR NDT SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference ROS/C++ package `hibikid39/ndt_slam` (see SURVEY.md):

- scan preprocessing (uniform-arc-length resampling),
- NDT scan-to-map registration (grid build, Newton solve, fitness),
- odometry/NDT Kalman fusion,
- submap-structured point-cloud mapping with dynamic-object removal,
- loop closure + pose-graph optimization (the reference left these as
  disabled scaffolding; here they are first-class),
- multi-chip sharding of the NDT reductions via jax.sharding.

Design stance (TPU-first, not a port): fixed-shape masked point buffers,
pure functions over a single SlamState pytree, one compiled per-frame
step; the map is a set of fixed-capacity device buffers; pairwise-distance
work is phrased as matmuls so it lands on the MXU.
"""

from ndt_slam_tpu.config import SlamConfig

__version__ = "0.1.0"

__all__ = ["SlamConfig", "__version__"]
