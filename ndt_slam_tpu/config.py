"""Single typed configuration for the whole pipeline.

One source of truth replacing the reference's ~22 scattered
`ros::param::get` sites (reference: ndt_mapping.launch:3-36,
include/ndt_slam/*.h constructors). Defaults equal the launch-file
values (SURVEY.md §6.2), which are the author's operating point.

Capacity fields (`max_*`, `grid_*`) are the TPU-side addition: every
variable-size structure in the reference (scan, submap, local map)
becomes a fixed-capacity masked buffer so the per-frame step compiles
once and never recompiles.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Mapping


@functools.cache
def _default_platform() -> str:
    """Backend platform of the default JAX device, cached per process
    (jax.devices() initializes the backend; one call suffices)."""
    import jax

    return jax.devices()[0].platform


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    # ---- driver (reference: SlamLauncher.h:65-71) ----
    start_frame: int = 0
    end_frame: int = 690
    # Live-viz cadence (reference: rviz map publish every draw_skip
    # frames, src/SlamLauncher.cpp:130-135): a bare `--viz-every` uses
    # this as the PNG render period. The reference's keyframe_skip
    # (global-map rebuild cadence) is consciously dropped — the global
    # map is assembled on demand here (see ARCHITECTURE.md).
    draw_skip: int = 5
    sidelidar: bool = False         # include left/right LiDAR blocks

    # ---- preprocessing (reference: ScanPointResampler.h:20-21) ----
    resample_space: float = 0.05        # uniform arc-length spacing [m]
    resample_space_thre: float = 0.25   # gap threshold: keep raw point [m]

    # ---- NDT registration (reference: PoseEstimator.h:65-70) ----
    ndt_resolution: float = 0.3     # NDT cell size [m]
    ndt_max_iterations: int = 35
    ndt_step_size: float = 0.1      # max Newton step norm [mixed m/rad]
    ndt_trans_eps: float = 0.01     # convergence threshold on |delta p|
    ndt_outlier_ratio: float = 0.55  # Gaussian-mixture outlier mass (PCL default)
    ndt_min_points_per_cell: int = 6  # PCL VoxelGridCovariance default
    ndt_neighborhood: int = 1       # cell search radius: 0 -> 1 cell, 1 -> 3x3
    # Engine: "auto" (default) resolves by platform — "pallas" on TPU,
    # "compact" elsewhere (see resolved_ndt_engine). "compact" =
    # gather-free [points x valid-cells] broadcast engine
    # (ndt/compact.py); "pallas" = same math as fused Pallas TPU
    # kernels with VMEM-resident pair intermediates (pallas_kernels.py,
    # the TPU-fast path — interpret-mode on CPU); "gather" = dense-
    # window neighbor-gather engine (ndt/score.py). Identical semantics
    # (parity: tests/distributed/test_pallas_sharded.py).
    ndt_engine: str = "auto"
    ndt_max_active_cells: int = 2048  # compact-table capacity (valid cells)
    source_leaf_size: float = 0.05  # ApproximateVoxelGrid leaf on source scan
    score_thre: float = 0.5         # accept iff fitness <= this (ScanMatcher.h:50)
    failed_cost: float = 1.0e7      # cost when not converged (PoseEstimator.cpp:44-46)
    # Innovation gate (conscious addition over the reference, which
    # gates on fitness alone, src/ScanMatcher.cpp:50-53): reject an NDT
    # result that strays implausibly far from the odometry prediction —
    # partially-symmetric environments admit distant false optima with
    # locally-good fitness ("teleports"); a gated reject degrades to
    # dead-reckoning exactly like a fitness reject.
    max_innovation_trans: float = 1.0   # [m]
    max_innovation_rot: float = 30.0    # [deg]
    # NDT target assembly. False (default) = previous submap's closed
    # cloud + the current submap's UNFILTERED cloud (documented
    # deviation, see PointCloudMap.registration_target); True = exact
    # reference semantics (voxel-filtered current submap,
    # src/PointCloudMap.cpp:119-134) for parity experiments.
    ndt_target_filtered: bool = False

    # ---- fusion (reference: PoseFuser.h:20-22, PoseEstimator.h:65) ----
    del_time: float = 0.5           # frame interval [s]
    coe_vel: float = 0.1            # translational velocity noise coefficient
    coe_omega: float = 0.5          # angular velocity noise coefficient
    coe_ndt_cov: float = 1.0        # scale on NDT covariance
    # Degenerate-direction fusion guard (conscious addition; round 5):
    # innovation components along NDT Hessian eigendirections whose
    # eigenvalue is below this fraction of the largest are dropped, so
    # the fused pose follows ODOMETRY there instead of a capped-variance
    # pseudo-measurement. Kills the slow corridor-slide failure mode
    # (a featureless hallway constrains nothing along its axis; see
    # fuse/ekf.gate_and_fuse). 0 disables.
    fuse_degenerate_ratio: float = 1e-3

    # ---- mapping (reference: PointCloudMap.h:37,92-95, PCFilter.h:22-23) ----
    submap_sep_thre: float = 10.0   # close submap after this travel distance [m]
    submap_leaf_size: float = 0.05  # voxel filter leaf for submap clouds
    remove_moving: bool = True      # dynamic-object removal on
    diff_resol: float = 0.05        # occupancy-diff cell size [m]
    thre_neighbor: float = 0.2      # reject points within this of a moving candidate [m]

    # ---- fixed capacities (TPU static shapes; not in reference) ----
    max_scan_points: int = 2048        # per scan, post-resample
    max_submap_points: int = 65536     # assembled submap cloud capacity
    max_local_map_points: int = 131072  # NDT target capacity (prev + cur submap)
    grid_cells_x: int = 192            # NDT grid extent (cells); window recenters
    grid_cells_y: int = 192            #   per frame on the predicted pose

    # Incremental NDT target grid (VERDICT r4 next-round #2): maintain
    # a per-submap-pair lattice of running NDT moments (additive; keyed
    # by absolute cell index) so the per-frame registration grid is a
    # window SLICE + the newest scan's ~2k-point scatter instead of a
    # full rescatter of the 131k-point local-map buffer. -1 = auto (on
    # for the TPU sequential pipeline, off elsewhere — batch/sharded
    # runners keep the from-scratch build); 0/1 force. Numerics differ
    # from the full rebuild only in f32 summation order (~ulp; parity:
    # tests/unit/test_incremental_grid.py).
    ndt_incremental_grid: int = -1
    # Moment-lattice extent (cells per side). -1 = auto: grid_cells +
    # enough margin that a frame window anchored anywhere within the
    # submap's travel (submap_sep_thre) plus 4 m of prediction slack
    # stays inside the lattice; the registration step emits an
    # in-range flag and the frontend falls back to the full rebuild
    # for any frame that escapes (loud, not silently wrong).
    grid_mom_cells: int = -1

    # Sequential-pipeline host-sync depth: frames in flight before the
    # host fetches their small outputs in one chunked transfer
    # (pipeline/async_frontend.PipelinedFrontEnd). 0 = fully
    # synchronous (one fetch round trip per frame); -1 = auto (8 on
    # TPU, where the fetch RTT dominates the frame; 0 elsewhere).
    # Trajectory is identical either way (speculation rolls back on
    # submap closes / corrections).
    pipeline_depth: int = -1

    # ---- numerics ----
    dtype: Any = dataclasses.field(default="float32")

    # ---- loop closure / pose graph (reference scaffolding, first-class here) ----
    loop_enable: bool = False
    loop_radius: float = 5.0           # candidate search radius [m]
    # Drift-aware candidate search: the radius for keyframe k widens by
    # gain * sqrt(max(0, var_cur - var_k)) where var is the largest
    # eigenvalue of the fused position covariance — the accumulated
    # relative drift since k under the odometry-chain model. A static
    # radius silently stops finding true revisits once drift exceeds
    # it (VERDICT r2 weak #7). 0 disables (static radius).
    loop_drift_gain: float = 3.0       # [sigmas]
    loop_min_frame_gap: int = 80       # min sid separation for a candidate
    loop_score_thre: float = 0.02      # accept iff trimmed mean NN d^2 <= this [m^2]
    loop_match_dist: float = 0.4       # NN match cutoff for overlap/trim [m]
    loop_min_overlap: float = 0.55     # min matched-source fraction to accept
    loop_stage_mults: tuple = (4, 2, 1)  # coarse-to-fine resolution ladder
    # Newton iteration cap per LADDER stage (0 = ndt_max_iterations).
    # The ladder only needs basin capture — the trimmed-ICP finisher
    # owns precision — so a lower cap trades verify device time
    # against stage-handoff robustness.
    loop_stage_max_iterations: int = 0
    # Multi-start at the coarse ladder stage: a plus-pattern of
    # half-coarse-cell-offset starts scored in one vmapped pass — the
    # coarse grid's quantized landscape has local minima ~half a cell
    # out that a single start falls into (1 disables; max 9).
    loop_coarse_starts: int = 5
    loop_max_candidates: int = 4       # verified per frame (batched)
    # Noise floor for loop-edge information calibration: the strongest
    # Hessian direction carries 1/sigma^2 with sigma = max(sqrt(verify
    # residual), this) [m]; weaker directions scale down with the
    # spectrum (graph/backend._resolve_verify).
    loop_info_sigma_floor: float = 0.03
    loop_keyframe_skip: int = 5        # store a keyframe every N frames
    loop_check_skip: int = 5           # attempt detection every N frames
    # Verification scheduling: 1 = dispatch the candidate batch and
    # resolve its packed results at the NEXT backend check, so verify
    # compute + fetch overlap with the frames in between (edges land
    # one check cycle late — absorbed by the deferred optimizer);
    # 0 = resolve within the same check (reference-eager). -1 = auto:
    # async on TPU (where the fetch round trip dominates), sync
    # elsewhere.
    loop_verify_async: int = -1
    max_keyframes: int = 4096          # hard bound; store decimates at capacity
    # Incremental map rewrite after a pose-graph correction: a closed
    # submap is rebuilt only if a member pose moved more than this
    # (PointCloudMap.remake_maps). 0/0 forces a full rebuild.
    remake_thresh_trans: float = 0.05   # [m]
    remake_thresh_rot: float = 0.5      # [deg]
    # Defer pose-graph optimization: accepted loop edges accumulate,
    # but optimize+remake runs at most once per this many frames
    # (0 = optimize on every accepted loop, the reference-style eager
    # behavior). Bursts of loops at a revisit then cost ONE correction.
    loop_opt_min_frames: int = 0
    pgo_iterations: int = 20
    # Above this many graph nodes the dense [3N,3N] solve is replaced by
    # the hierarchical solver (Schur-style chain condensation + dense
    # coarse solve + matrix-free PCG polish, graph/pose_graph.py).
    pgo_dense_max_nodes: int = 512
    pgo_seg_len: int = 32              # nodes per condensed chain segment
    pgo_fine_iterations: int = 10      # GN iterations of the PCG polish
    pgo_cg_iters: int = 1024           # CG bound inside each polish GN step
    pgo_cycles: int = 3                # hierarchical V-cycles

    # Derived sizes -----------------------------------------------------
    @property
    def resolved_ndt_engine(self) -> str:
        """The engine actually run: "auto" picks the fused Pallas
        kernels on TPU (measured fastest there, ndt/pallas_kernels.py
        module docstring) and the compact broadcast engine elsewhere
        (Pallas interpret-mode on CPU is slow). Consumers must read
        this, never `ndt_engine` directly."""
        if self.ndt_engine != "auto":
            return self.ndt_engine
        return "pallas" if _default_platform() == "tpu" else "compact"

    @property
    def resolved_pipeline_depth(self) -> int:
        """The host-sync chunk depth actually used by the sequential
        runner: "auto" (-1) resolves to 8 on TPU (the per-frame fetch
        RTT is the dominant cost there) and 0 (synchronous) elsewhere."""
        if self.pipeline_depth >= 0:
            return self.pipeline_depth
        return 8 if _default_platform() == "tpu" else 0

    @property
    def resolved_loop_verify_async(self) -> bool:
        """Whether loop verification resolves one check cycle late
        (see loop_verify_async)."""
        if self.loop_verify_async >= 0:
            return bool(self.loop_verify_async)
        return _default_platform() == "tpu"

    @property
    def resolved_ndt_incremental_grid(self) -> bool:
        """Whether the sequential frontend registers against the
        incremental moment lattice (see ndt_incremental_grid).

        Forced OFF under ndt_target_filtered: the lattice mirrors the
        UNFILTERED (prev closed + proc + newest) assembly, while the
        reference-semantics mode registers against the voxel-FILTERED
        current submap (src/PointCloudMap.cpp:119-134) — a materially
        different density (measured: killian_robot reference-semantics
        ATE 11.05 vs 0.72 when the lattice was wrongly used)."""
        if self.ndt_target_filtered:
            return False
        if self.ndt_incremental_grid >= 0:
            return bool(self.ndt_incremental_grid)
        return _default_platform() == "tpu"

    @property
    def resolved_grid_mom_cells(self) -> int:
        """Moment-lattice side length (cells), even, >= grid window."""
        if self.grid_mom_cells > 0:
            b = max(self.grid_mom_cells,
                    max(self.grid_cells_x, self.grid_cells_y))
        else:
            import math
            margin = math.ceil(
                (self.submap_sep_thre + 4.0) / self.ndt_resolution
            )
            b = max(self.grid_cells_x, self.grid_cells_y) + 2 * margin
        return b + (b % 2)

    @property
    def grid_num_cells(self) -> int:
        return self.grid_cells_x * self.grid_cells_y

    @property
    def grid_extent_x(self) -> float:
        return self.grid_cells_x * self.ndt_resolution

    @property
    def grid_extent_y(self) -> float:
        return self.grid_cells_y * self.ndt_resolution

    def replace(self, **kw) -> "SlamConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "SlamConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - fields
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**d)

    # A small config for unit tests / CPU runs.
    @classmethod
    def small(cls, **kw) -> "SlamConfig":
        base = dict(
            max_scan_points=512,
            max_submap_points=8192,
            max_local_map_points=16384,
            grid_cells_x=96,
            grid_cells_y=96,
            max_keyframes=256,
        )
        base.update(kw)
        return cls(**base)
