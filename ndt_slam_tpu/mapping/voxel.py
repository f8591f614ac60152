"""Voxel-grid downsampling as sort + segment means.

TPU-native replacement for pcl::ApproximateVoxelGrid (reference:
src/PoseEstimator.cpp:6-10 source downsample, src/PointCloudMap.cpp:4-13
submap filter). PCL's version is hash-approximate (collisions merge
distinct voxels); this one is exact: points are keyed by their voxel,
sorted, and reduced to per-voxel centroids with segment sums — one
fixed-shape fused pass, no host loops.

Voxel key packing: cell coords offset by 2^15 into [0, 2^16) each and
packed into one uint32, supporting |coord| < 32768 cells (≈ ±1638 m at
a 0.05 m leaf). Masked points get the max key and sort to the back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ndt_slam_tpu.core.points import PointBuffer, PAD_COORD

# Host scalar, not jnp: a module-level jnp constant lives on the
# default device and stalls jit lowering over a remote-TPU tunnel.
_SENTINEL = np.uint32(0xFFFFFFFF)


def voxel_keys(xy: jnp.ndarray, mask: jnp.ndarray, leaf: float) -> jnp.ndarray:
    """uint32 voxel key per point; masked/out-of-range -> sentinel."""
    c = jnp.floor(xy / leaf).astype(jnp.int32) + 32768
    in_range = jnp.all((c >= 0) & (c < 65536), axis=-1)
    key = (c[:, 0].astype(jnp.uint32) << 16) | c[:, 1].astype(jnp.uint32)
    return jnp.where(mask & in_range, key, _SENTINEL)


def voxel_filter(buf: PointBuffer, leaf: float) -> PointBuffer:
    """One centroid per occupied voxel; output capacity == input capacity
    (a downsample can never grow the point count)."""
    n = buf.capacity
    keys = voxel_keys(buf.xy, buf.mask, leaf)
    order = jnp.argsort(keys)
    skeys = keys[order]
    sxy = buf.xy[order]
    svalid = skeys != _SENTINEL

    first = svalid & jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
    )
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1        # [-1 .. nseg-1]
    seg = jnp.where(svalid, jnp.clip(seg, 0, n - 1), n)  # dump invalid

    # Single fused scatter of (1, x, y) rows — one pass instead of three.
    ones = svalid.astype(buf.xy.dtype)
    rows = jnp.stack(
        [ones,
         jnp.where(svalid, sxy[:, 0], 0.0),
         jnp.where(svalid, sxy[:, 1], 0.0)],
        axis=-1,
    )
    acc = jax.ops.segment_sum(rows, seg, num_segments=n + 1)[:n]
    cnt, sx, sy = acc[:, 0], acc[:, 1], acc[:, 2]

    valid = cnt > 0
    d = jnp.maximum(cnt, 1.0)
    xy = jnp.stack([sx / d, sy / d], axis=-1)
    xy = jnp.where(valid[:, None], xy, PAD_COORD)
    return PointBuffer(xy, valid)
