"""Multi-host runtime: jax.distributed bootstrap + mesh helpers.

The reference is a single ROS node (SURVEY.md §2.3 — no multi-process
anything). Here the multi-host story is the standard JAX one: one
process per host, `jax.distributed.initialize` wires the XLA runtime,
and all communication happens INSIDE compiled programs as named
collectives over ICI/DCN — there is no hand-written transport.

Host roles:
- every process sees the global device set and participates in the
  same pjit/shard_map programs;
- process 0 owns dataset I/O and metrics/output writing (guard with
  `is_coordinator()`);
- batch workloads (loop-closure candidate verification, batched pair
  registration, multi-sequence evaluation) build global arrays with
  `jax.make_array_from_callback` and shard their batch axis across all
  hosts' devices (proven cross-process in
  tests/distributed/test_multiprocess.py);
- the SEQUENTIAL per-frame SLAM loop runs multi-host through
  pipeline/dist_runner.py: the coordinator reads the log and
  `broadcast_frame` ships each frame to every process
  (multihost_utils.broadcast_one_to_all); registration executes with
  its point buffers sharded over the GLOBAL device set
  (parallel/register.make_sharded_sequential_step), and the map/graph
  bookkeeping is replicated deterministically per process. Proven
  cross-process in tests/distributed/test_multiprocess.py::
  test_two_process_sequential_loop.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bootstrap the multi-host JAX runtime (no-op when single-host).

    Arguments default to the standard env vars JAX also reads
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID); on
    Cloud TPU pods all of this is auto-detected and plain
    `initialize()` suffices.
    """
    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    auto_tpu = "TPU_WORKER_HOSTNAMES" in os.environ
    if explicit is None and not auto_tpu:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0


def broadcast_scalar(value: float) -> float:
    """One float from the coordinator to every process (e.g. the frame
    count before the sequential loop starts). Pass-through single-host."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = np.asarray([value if is_coordinator() else 0.0], np.float32)
    return float(multihost_utils.broadcast_one_to_all(arr)[0])


def broadcast_frame(
    scan_xy: "np.ndarray | None",
    odo_pose_deg: "np.ndarray | None",
    capacity: int,
):
    """One frame (raw sensor-frame scan + odometry pose) from the
    coordinator to every process. Non-coordinator processes pass None
    for both. Returns (scan_xy [n,2] f32, odo_pose_deg [3] f32),
    identical on every process. Single-host: pass-through.

    The scan is padded to `capacity` points for the fixed-size
    collective and truncated back to its true count after; one
    broadcast carries scan + count + pose in a single flat payload (one
    collective per frame, not three).
    """
    if jax.process_count() == 1:
        return (np.asarray(scan_xy, np.float32),
                np.asarray(odo_pose_deg, np.float32))
    from jax.experimental import multihost_utils

    if is_coordinator():
        scan = np.asarray(scan_xy, np.float32)[:capacity]
        n = scan.shape[0]
        buf = np.zeros((capacity, 2), np.float32)
        buf[:n] = scan
        payload = np.concatenate(
            [buf.ravel(), [np.float32(n)],
             np.asarray(odo_pose_deg, np.float32)]
        ).astype(np.float32)
    else:
        payload = np.zeros(capacity * 2 + 4, np.float32)
    payload = np.asarray(multihost_utils.broadcast_one_to_all(payload))
    n = int(payload[capacity * 2])
    scan = payload[: capacity * 2].reshape(capacity, 2)[:n]
    odo = payload[capacity * 2 + 1: capacity * 2 + 4]
    return scan.copy(), odo.copy()


def local_device_count() -> int:
    return jax.local_device_count()


def global_device_count() -> int:
    return jax.device_count()
