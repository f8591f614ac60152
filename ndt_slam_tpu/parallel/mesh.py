"""Device-mesh construction for multi-chip SLAM.

The reference is single-process/single-thread (SURVEY.md §2.3); the
TPU-native scaling axes are:

- "pt" (tensor-parallel analog): point buffers — the registration
  target and source — sharded across chips; NDT grid moments, Newton
  reductions, and fitness sums ride ICI as psum/pmin collectives.
- "dp" (data parallel): independent scan pairs (loop-closure candidate
  verification, multi-sequence batch runs) sharded across chips.

Meshes are plain `jax.sharding.Mesh` objects; everything downstream is
`shard_map` + named collectives, so the same code runs on one chip
(trivial mesh) or a pod slice.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None,
    dp: int | None = None,
    axis_batch: str = "dp",
    axis_points: str = "pt",
) -> Mesh:
    """A (dp, pt) mesh over the first `n_devices` devices.

    `dp` defaults to 1 (all chips shard points). Within a slice both
    axes map onto ICI; shard the batch axis over slices (DCN) and the
    point axis within a slice when running multi-slice.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if dp is None:
        dp = 1
    if n % dp != 0:
        raise ValueError(f"n_devices={n} not divisible by dp={dp}")
    arr = np.asarray(devs[:n]).reshape(dp, n // dp)
    return Mesh(arr, (axis_batch, axis_points))


def balanced_factors(n: int) -> tuple[int, int]:
    """Largest f <= sqrt(n) dividing n, as (f, n // f)."""
    f = max(d for d in range(1, int(math.isqrt(n)) + 1) if n % d == 0)
    return f, n // f
