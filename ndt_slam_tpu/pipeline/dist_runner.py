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
from ndt_slam_tpu.core import pose2
from ndt_slam_tpu.core.points import PAD_COORD, PointBuffer
from ndt_slam_tpu.mapping.voxel import voxel_filter
from ndt_slam_tpu.parallel.dist import (
    broadcast_frame, broadcast_scalar, is_coordinator,
)
from ndt_slam_tpu.parallel.register import make_sharded_sequential_step
from ndt_slam_tpu.pipeline.frontend import FrameResult, FrontEnd


@partial(jax.jit, static_argnames=("leaf",))
def _voxel_src(xy, mask, leaf: float):
    return voxel_filter(PointBuffer(xy, mask), leaf)


@jax.jit
def _global_scan(fused_pose, scan_xy, scan_mask):
    g = pose2.global_points(fused_pose, scan_xy)
    return jnp.where(scan_mask[:, None], g, PAD_COORD)


class DistFrontEnd(FrontEnd):
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

    def _to_global(self, host_arr: np.ndarray, sharding):
        return jax.make_array_from_callback(
            host_arr.shape, sharding, lambda idx: host_arr[idx]
        )

    def _run_step(self, scan: PointBuffer, odo_dev, prev_odo_dev,
                  last_pose_dev, local: PointBuffer) -> FrameResult:
        cfg = self.cfg
        # source voxel filter runs replicated per process (identical
        # inputs -> identical outputs), matching the single-device
        # step's in-program filter exactly
        srcf = _voxel_src(scan.xy, scan.mask, cfg.source_leaf_size)
        g = self._to_global
        out = self._seq_step(
            g(np.asarray(srcf.xy), self._pt),
            g(np.asarray(srcf.mask), self._pt),
            g(np.asarray(odo_dev), self._rep),
            g(np.asarray(prev_odo_dev), self._rep),
            g(np.asarray(last_pose_dev), self._rep),
            g(np.asarray(self.last_cov), self._rep),
            g(np.asarray(local.xy), self._pt),
            g(np.asarray(local.mask), self._pt),
        )
        host = jax.device_get(out)  # replicated -> locally addressable
        fused = jnp.asarray(host.fused_pose)
        global_xy = _global_scan(fused, scan.xy, scan.mask)
        packed = np.concatenate([
            np.asarray(host.fused_pose, np.float32),
            np.asarray(host.cov, np.float32).reshape(-1),
            np.asarray([host.cost, float(bool(host.successful)),
                        float(host.iterations), host.matched,
                        host.trans_probability], np.float32),
            np.asarray(host.est_pose, np.float32),
            np.asarray(host.error_pose, np.float32),
            np.ones(1, np.float32),  # grid_ok (full rebuild path)
        ])
        return FrameResult(
            est_pose=jnp.asarray(host.est_pose),
            fused_pose=fused,
            cov=jnp.asarray(host.cov),
            cost=jnp.asarray(host.cost),
            successful=jnp.asarray(host.successful),
            iterations=jnp.asarray(host.iterations),
            matched=jnp.asarray(host.matched),
            global_xy=global_xy,
            error_pose=jnp.asarray(host.error_pose),
            trans_probability=jnp.asarray(host.trans_probability),
            packed=jnp.asarray(packed),
            grid_ok=jnp.float32(1.0),
        )


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
