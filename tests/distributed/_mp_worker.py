"""Worker process for the 2-process `jax.distributed` CPU tests.

Usage: python _mp_worker.py <process_id> <num_processes> <port> <out.npz>
                            [batch|seq]

Each process brings 4 virtual CPU devices; `jax.distributed.initialize`
(via ndt_slam_tpu.parallel.dist.initialize — the same entry point
cli/run_slam.py --distributed uses) wires them into one global runtime.

Modes:
  batch (default) — loop-closure batch registration sharded over ALL
    processes' devices (gloo host-collectives under XLA's named
    collectives). Process 0 writes the batch poses.
  seq — the SEQUENTIAL SLAM loop: only process 0 holds the frames;
    each frame is shipped by `broadcast_frame` and registration runs
    with point buffers sharded over the global 8-device mesh
    (pipeline/dist_runner.run_slam_distributed). Process 0 writes the
    trajectory.
"""

import os
import sys

pid, nprocs, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
mode = sys.argv[5] if len(sys.argv) > 5 else "batch"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from ndt_slam_tpu.parallel.dist import initialize, is_coordinator  # noqa: E402

initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=pid,
)
assert jax.device_count() == 4 * nprocs, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from ndt_slam_tpu.config import SlamConfig  # noqa: E402
from ndt_slam_tpu.core.points import pad_points  # noqa: E402
from ndt_slam_tpu.parallel import make_batch_register  # noqa: E402

CFG = SlamConfig(
    grid_cells_x=64, grid_cells_y=64,
    ndt_min_points_per_cell=3, ndt_max_iterations=80,
    ndt_trans_eps=1e-4,
)


def room_scan(n, pose=(0.0, 0.0, 0.0), noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    tx, ty, th = pose
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    pts = []
    for a in angles:
        wa = a + th
        dx, dy = np.cos(wa), np.sin(wa)
        ts = []
        if dx > 1e-9: ts.append((5.0 - tx) / dx)
        if dx < -1e-9: ts.append((-5.0 - tx) / dx)
        if dy > 1e-9: ts.append((4.0 - ty) / dy)
        if dy < -1e-9: ts.append((-4.0 - ty) / dy)
        t = min(t for t in ts if t > 0) + noise * rng.standard_normal()
        pts.append([t * np.cos(a), t * np.sin(a)])
    return np.asarray(pts, dtype=np.float32)


if mode == "seq":
    from ndt_slam_tpu.io.simulate import simulate_sequence
    from ndt_slam_tpu.pipeline.dist_runner import run_slam_distributed

    seq_cfg = SlamConfig.small(
        end_frame=10_000, ndt_trans_eps=1e-4, ndt_max_iterations=80
    )
    # ONLY the coordinator holds the dataset — the other process gets
    # every frame via the broadcast, which is the thing under test.
    frames = (
        simulate_sequence(n_frames=10, beams=181, seed=3)
        if is_coordinator() else None
    )
    fe = run_slam_distributed(frames, seq_cfg)
    # the SAME loop, pipelined (chunked host sync over the sharded
    # step — pipeline/dist_runner.PipelinedDistFrontEnd): speculation
    # must replay to the BIT-identical trajectory (VERDICT r4 #4)
    fe_pipe = run_slam_distributed(
        frames, seq_cfg.replace(pipeline_depth=4)
    )
    if is_coordinator():
        np.savez(out_path, poses=fe.get_poses(),
                 poses_pipe=fe_pipe.get_poses(),
                 pipe_rollbacks=fe_pipe.n_rollbacks,
                 n_global_devices=jax.device_count())
    print(f"[p{pid}] seq done, devices={jax.device_count()}", flush=True)
    sys.exit(0)

# Deterministic workload, identical on every process.
POSES = [(0.03, 0.02, -0.03), (-0.02, 0.03, 0.04),
         (0.04, -0.03, 0.02), (-0.03, -0.02, -0.04)]
B = len(POSES)
tgt = pad_points(room_scan(720, noise=0.01), 2048)
srcs = [pad_points(room_scan(360, pose=p, noise=0.01, seed=i), 512)
        for i, p in enumerate(POSES)]

full = {
    "src_xy": np.stack([np.asarray(s.xy) for s in srcs]),
    "src_mask": np.stack([np.asarray(s.mask) for s in srcs]),
    "tgt_xy": np.broadcast_to(np.asarray(tgt.xy), (B,) + tgt.xy.shape),
    "tgt_mask": np.broadcast_to(np.asarray(tgt.mask), (B,) + tgt.mask.shape),
    "init": np.zeros((B, 3), np.float32),
    "center": np.zeros((B, 2), np.float32),
}

mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("dp", "pt"))
specs = {
    "src_xy": P("dp", "pt"), "src_mask": P("dp", "pt"),
    "tgt_xy": P("dp", "pt"), "tgt_mask": P("dp", "pt"),
    "init": P("dp"), "center": P("dp"),
}


def to_global(name):
    arr = full[name]
    sharding = NamedSharding(mesh, specs[name])
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


args = [to_global(k) for k in
        ("src_xy", "src_mask", "tgt_xy", "tgt_mask", "init", "center")]
fn = make_batch_register(mesh, CFG)
out = fn(*args)
poses = np.asarray(
    multihost_utils.process_allgather(out.pose_rad, tiled=True)
)
conv = np.asarray(
    multihost_utils.process_allgather(out.converged, tiled=True)
)
# process_allgather tiles over processes; the output is already global
# along dp, so every process sees the same [B,3] — take the first copy.
poses = poses.reshape(-1, 3)[:B]
conv = conv.reshape(-1)[:B]
if is_coordinator():
    np.savez(out_path, poses=poses, converged=conv,
             n_global_devices=jax.device_count())
print(f"[p{pid}] done, devices={jax.device_count()}", flush=True)
