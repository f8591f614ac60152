"""Dynamic-object removal primitives.

Replaces the reference's PCFilter (reference: include/ndt_slam/
PCFilter.h:29-94) with fixed-shape vectorized equivalents:

- `occupancy_diff_mask` — pcl OctreePointCloudChangeDetector semantics
  in 2D: points of `test` whose `resol`-voxel is not occupied by any
  `base` point, via a binary search over sorted base voxel keys (no
  octree, no hashing, one sort + one searchsorted).
- `keep_far_from_mask` — the reference's brute-force O(N·M)
  remove_neighborPoint, phrased as a chunked min-distance matmul so it
  lands on the MXU instead of a scalar double loop.
- `process_interior_scan` — the per-scan composite used by
  Submap::makeMap (reference: src/PointCloudMap.cpp:15-31): moving
  candidates = diff(prev ∪ next -> cur); keep cur points at least
  `thre_neighbor` away from every candidate.
"""

from __future__ import annotations

import jax.numpy as jnp

from ndt_slam_tpu.core.points import PointBuffer, PAD_COORD
from ndt_slam_tpu.mapping.voxel import voxel_keys, _SENTINEL
from ndt_slam_tpu.ndt.fitness import nn_sq_dists


def occupancy_diff_mask(
    base_xy: jnp.ndarray,
    base_mask: jnp.ndarray,
    test_xy: jnp.ndarray,
    test_mask: jnp.ndarray,
    resol: float,
) -> jnp.ndarray:
    """Mask over `test`: True where the point's voxel is NOT occupied in
    `base` (i.e. the point "appeared" — a moving-object candidate)."""
    bkeys = jnp.sort(voxel_keys(base_xy, base_mask, resol))
    tkeys = voxel_keys(test_xy, test_mask, resol)
    pos = jnp.searchsorted(bkeys, tkeys)
    pos = jnp.clip(pos, 0, bkeys.shape[0] - 1)
    in_base = (bkeys[pos] == tkeys) & (tkeys != _SENTINEL)
    return test_mask & ~in_base


def keep_far_from_mask(
    pts_xy: jnp.ndarray,
    pts_mask: jnp.ndarray,
    cand_xy: jnp.ndarray,
    cand_mask: jnp.ndarray,
    thre: float,
) -> jnp.ndarray:
    """Mask over `pts`: True where min distance to every valid candidate
    is >= thre (all kept when there are no candidates, matching the
    reference's flag-stays-true behavior)."""
    d2 = nn_sq_dists(pts_xy, pts_mask, cand_xy, cand_mask)
    no_cand = ~jnp.any(cand_mask)
    return pts_mask & (no_cand | (d2 >= thre * thre))


def process_interior_scan(
    prev: PointBuffer,
    cur: PointBuffer,
    nxt: PointBuffer,
    resol: float,
    thre_neighbor: float,
) -> PointBuffer:
    """Dynamic-removal pass for one interior scan of a submap.

    base = prev ∪ next; candidates = cur points in voxels unseen in
    base; output = cur with points near any candidate removed.
    """
    base_xy = jnp.concatenate([prev.xy, nxt.xy], axis=0)
    base_mask = jnp.concatenate([prev.mask, nxt.mask], axis=0)
    cand = occupancy_diff_mask(base_xy, base_mask, cur.xy, cur.mask, resol)
    cand_xy = jnp.where(cand[:, None], cur.xy, PAD_COORD)
    keep = keep_far_from_mask(cur.xy, cur.mask, cand_xy, cand, thre_neighbor)
    xy = jnp.where(keep[:, None], cur.xy, PAD_COORD)
    return PointBuffer(xy, keep)
