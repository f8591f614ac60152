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
- the SEQUENTIAL per-frame SLAM loop is single-host today: under
  `--distributed` every process recomputes the same pipeline and only
  the coordinator writes output (correct but redundant). A true
  multi-host sequential path needs a per-frame broadcast of the scan
  plus point-axis sharding over the global device set.
"""

from __future__ import annotations

import os

import jax


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


def local_device_count() -> int:
    return jax.local_device_count()


def global_device_count() -> int:
    return jax.device_count()
