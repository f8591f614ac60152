"""Multi-host SEQUENTIAL SLAM loop.

The reference is one single-threaded process (SURVEY.md §2.3); here the
per-frame registration spreads over every chip of a multi-host runtime:

- the coordinator (process 0) owns dataset I/O; each frame is shipped
  to all processes with ONE `broadcast_one_to_all` collective
  (parallel/dist.broadcast_frame);
- the registration step runs as one global SPMD program with the
  voxel-filtered source and the registration target sharded over the
  global "pt" mesh axis — grid-moment psums, lockstep Newton, sharded
  fitness (parallel/register.make_sharded_sequential_step);
- the map / pose-graph bookkeeping is host-side and DETERMINISTIC given
  the step outputs, so every process replicates it identically from the
  replicated outputs (standard SPMD single-program discipline) and only
  the coordinator writes artifacts.

`DistFrontEnd` is a FrontEnd whose `_run_step` routes through the
global program, so the sequential driver, metrics, checkpointing, and
loop-closure backend are all reused unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core.points import PointBuffer
from ndt_slam_tpu.mapping.voxel import voxel_filter
from ndt_slam_tpu.parallel.dist import (
    broadcast_frame, broadcast_scalar, is_coordinator,
)
from ndt_slam_tpu.parallel.register import make_sharded_sequential_step
from ndt_slam_tpu.pipeline.async_frontend import PipelinedFrontEnd
from ndt_slam_tpu.pipeline.frontend import FrameResult, FrontEnd


@partial(jax.jit, static_argnames=("leaf",))
def _voxel_src(xy, mask, leaf: float):
    return voxel_filter(PointBuffer(xy, mask), leaf)


class _ShardedStepMixin:
    """The sharded `_run_step` shared by the synchronous and the
    pipelined multi-host frontends.

    No host value crosses the boundary per frame: local device arrays
    are resharded onto the global mesh with device-side slices
    (`_to_global_dev`), and the replicated global outputs are consumed
    as this process's LOCAL device shard (`addressable_shards[0].data`
    of a replicated array is the full value). The step therefore
    composes with PipelinedFrontEnd's speculative dispatch exactly
    like the single-device step does — the per-frame `device_get` of
    the old implementation was the multi-host analog of the round-3
    synchronous pipeline (VERDICT r4 next-round #4).
    """

    def _init_sharded_step(self, cfg: SlamConfig, mesh: Optional[Mesh]):
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), ("pt",))
        n = mesh.devices.size
        assert cfg.max_scan_points % n == 0, (cfg.max_scan_points, n)
        assert cfg.max_local_map_points % n == 0, (
            cfg.max_local_map_points, n)
        self.mesh = mesh
        self._seq_step = make_sharded_sequential_step(mesh, cfg)
        self._pt = NamedSharding(mesh, P("pt"))
        self._rep = NamedSharding(mesh, P())

    def _to_global_dev(self, arr, sharding):
        """Local device array -> global array on `sharding`, shard
        slices taken device-side (no host round trip)."""
        arr = jnp.asarray(arr)
        dmap = sharding.addressable_devices_indices_map(arr.shape)
        shards = [jax.device_put(arr[idx], d) for d, idx in dmap.items()]
        return jax.make_array_from_single_device_arrays(
            arr.shape, sharding, shards
        )

    @staticmethod
    def _local(a):
        """This process's local view of a REPLICATED global array (the
        full value), usable by local programs — no transfer."""
        return a.addressable_shards[0].data

    def _run_step(self, scan: PointBuffer, odo_dev, prev_odo_dev,
                  last_pose_dev, local: PointBuffer) -> FrameResult:
        cfg = self.cfg
        # source voxel filter runs replicated per process (identical
        # inputs -> identical outputs), matching the single-device
        # step's in-program filter exactly
        srcf = _voxel_src(scan.xy, scan.mask, cfg.source_leaf_size)
        g = self._to_global_dev
        out = self._seq_step(
            g(srcf.xy, self._pt),
            g(srcf.mask, self._pt),
            g(odo_dev, self._rep),
            g(prev_odo_dev, self._rep),
            g(last_pose_dev, self._rep),
            g(self.last_cov, self._rep),
            g(local.xy, self._pt),
            g(local.mask, self._pt),
            g(scan.xy, self._rep),
            g(scan.mask, self._rep),
        )
        loc = self._local
        return FrameResult(
            est_pose=loc(out.est_pose),
            fused_pose=loc(out.fused_pose),
            cov=loc(out.cov),
            cost=loc(out.cost),
            successful=loc(out.successful),
            iterations=loc(out.iterations),
            matched=loc(out.matched),
            global_xy=loc(out.global_xy),
            error_pose=loc(out.error_pose),
            trans_probability=loc(out.trans_probability),
            packed=loc(out.packed),
            grid_ok=jnp.float32(1.0),
        )


class DistFrontEnd(_ShardedStepMixin, FrontEnd):
    """FrontEnd whose registration is sharded over the global devices.

    Works single-process too (the mesh is then local) — the 2-process
    gloo test compares exactly these two modes.
    """

    def __init__(self, cfg: SlamConfig, mesh: Optional[Mesh] = None,
                 loop_mesh: Optional[Mesh] = None):
        # loop_mesh shards the loop-closure verify ladder (GraphBackend);
        # `mesh` shards the per-frame registration. They are distinct:
        # the registration mesh is global ("pt" over all processes),
        # while loop verification batches shard process-locally.
        super().__init__(cfg, mesh=loop_mesh)
        self._init_sharded_step(cfg, mesh)


class PipelinedDistFrontEnd(_ShardedStepMixin, PipelinedFrontEnd):
    """Multi-host sequential loop WITH chunked host sync: the sharded
    per-frame step dispatches speculatively (device-resident carries,
    global arrays fed straight back as the next frame's inputs) and
    the host resolves packed rows in chunks, exactly as the
    single-chip PipelinedFrontEnd does. Every process runs identical
    deterministic bookkeeping on replicated outputs, so the processes
    stay in lockstep without a per-frame barrier."""

    def __init__(self, cfg: SlamConfig, mesh: Optional[Mesh] = None,
                 loop_mesh: Optional[Mesh] = None,
                 depth: Optional[int] = None):
        super().__init__(cfg, mesh=loop_mesh, depth=depth)
        self._init_sharded_step(cfg, mesh)


def run_slam_distributed(
    frames: Optional[List],
    cfg: SlamConfig,
    mesh: Optional[Mesh] = None,
    out_dir: Optional[str] = None,
    verbose: bool = False,
    loop_mesh: Optional[Mesh] = None,
) -> FrontEnd:
    """Drive the sequential loop multi-host: only the COORDINATOR
    passes `frames` (every other process passes None and receives each
    frame via the per-frame broadcast). Returns the local DistFrontEnd
    (identical trajectory on every process; artifacts written only when
    `out_dir` is given — pass it on the coordinator only)."""
    if cfg.resolved_pipeline_depth > 0:
        # chunked host sync over the sharded step (same speculation /
        # rollback contract as the single-chip pipelined frontend)
        fe = PipelinedDistFrontEnd(cfg, mesh=mesh, loop_mesh=loop_mesh)
    else:
        fe = DistFrontEnd(cfg, mesh=mesh, loop_mesh=loop_mesh)
    if is_coordinator():
        assert frames is not None, "coordinator needs the frames"
        n_frames = min(len(frames), cfg.end_frame)
    else:
        n_frames = 0
    n_frames = int(broadcast_scalar(n_frames))

    for t in range(n_frames):
        if is_coordinator():
            fr = frames[t]
            sid = getattr(fr, "sid", None)
            if sid is None:
                sid = getattr(fr, "stamp", t)
            scan, odo = broadcast_frame(
                fr.scan_xy, fr.odo_pose, 4 * cfg.max_scan_points
            )
            sid = int(broadcast_scalar(sid))
        else:
            scan, odo = broadcast_frame(
                None, None, 4 * cfg.max_scan_points
            )
            sid = int(broadcast_scalar(0))
        fe.process(scan, odo, sid=sid)
        if verbose and is_coordinator() and (t + 1) % 50 == 0:
            print(f"[dist_runner] frame {t + 1}/{n_frames}", flush=True)

    # apply any deferred loop-closure correction the optimizer is still
    # holding (same as runner.run_slam / BatchFrontEnd.finalize) —
    # deterministic from replicated state, so every process stays in sync
    fe.finalize()

    if out_dir is not None:
        import os

        from ndt_slam_tpu.io.pcd import save_pcd
        from ndt_slam_tpu.io.traj import (
            save_poses_full, save_poses_reference_format,
        )

        os.makedirs(out_dir, exist_ok=True)
        poses = fe.get_poses()
        save_poses_reference_format(
            os.path.join(out_dir, "poses.txt"), poses)
        save_poses_full(os.path.join(out_dir, "poses_full.txt"), poses)
        save_pcd(os.path.join(out_dir, "map.pcd"), fe.pcmap.global_map())
    return fe
