"""Fixed-capacity masked point buffers.

The reference uses std::vector point clouds that grow per frame; under
XLA everything must be static-shape, so every point set becomes a
(xy[N,2] float32, mask[N] bool) pair. Invalid slots hold a far-away
sentinel coordinate so they can never win nearest-neighbor or fall in a
valid NDT cell even if a mask is forgotten downstream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Sentinel for padded slots: far outside any realistic map.
PAD_COORD = 1.0e8


class PointBuffer(NamedTuple):
    xy: jnp.ndarray    # [N, 2] float32
    mask: jnp.ndarray  # [N] bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))

    @staticmethod
    def empty(capacity: int) -> "PointBuffer":
        return PointBuffer(
            xy=jnp.full((capacity, 2), PAD_COORD, dtype=jnp.float32),
            mask=jnp.zeros((capacity,), dtype=bool),
        )


def pad_points(xy: np.ndarray, capacity: int) -> PointBuffer:
    """Host-side: pad an [n,2] array to capacity (truncating if over)."""
    xy = np.asarray(xy, dtype=np.float32).reshape(-1, 2)
    n = min(xy.shape[0], capacity)
    out = np.full((capacity, 2), PAD_COORD, dtype=np.float32)
    out[:n] = xy[:n]
    mask = np.zeros((capacity,), dtype=bool)
    mask[:n] = True
    return PointBuffer(jnp.asarray(out), jnp.asarray(mask))


def sanitize(buf: PointBuffer) -> PointBuffer:
    """Force padded slots to the sentinel coordinate."""
    xy = jnp.where(buf.mask[:, None], buf.xy, PAD_COORD)
    return PointBuffer(xy, buf.mask)


def compact(buf: PointBuffer) -> PointBuffer:
    """Move valid points to the front (stable), padding the tail.

    Jittable: stable argsort on the inverted mask.
    """
    order = jnp.argsort(~buf.mask, stable=True)
    xy = buf.xy[order]
    mask = buf.mask[order]
    xy = jnp.where(mask[:, None], xy, PAD_COORD)
    return PointBuffer(xy, mask)


def concat_buffers(a: PointBuffer, b: PointBuffer, capacity: int) -> PointBuffer:
    """Concatenate two buffers into a fresh buffer of `capacity`.

    Valid points of `a` first, then of `b`; silently truncates overflow
    (capacities are sized so this only matters in adversarial configs).
    """
    xy = jnp.concatenate([a.xy, b.xy], axis=0)
    mask = jnp.concatenate([a.mask, b.mask], axis=0)
    c = compact(PointBuffer(xy, mask))
    return PointBuffer(c.xy[:capacity], c.mask[:capacity])


def from_host_list(points, capacity: int) -> PointBuffer:
    return pad_points(np.asarray(points, dtype=np.float32), capacity)
