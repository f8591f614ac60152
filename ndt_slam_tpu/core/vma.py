"""Varying-manual-axes (vma) helpers for loop carries inside shard_map.

JAX's shard_map types every value with the set of mesh axes it varies
over; `lax.scan` / `lax.while_loop` require the carry's vma to equal
the body output's vma exactly. A freshly-created constant is invariant,
so carries initialized from literals must be explicitly cast to the
vma their body will produce. These helpers compute that set from the
data the body actually reads. All no-ops outside shard_map.
"""

from __future__ import annotations

from typing import Iterable

import jax


def vma_of(*arrays) -> set:
    """Union of the varying-axes of `arrays` (empty outside shard_map)."""
    out: set = set()
    for a in arrays:
        out |= set(getattr(jax.typeof(a), "vma", ()) or ())
    return out


def cast_to_vma(x, vma: Iterable[str]):
    """Make `x` varying over exactly the axes in `vma` it isn't already."""
    need = tuple(set(vma) - vma_of(x))
    return jax.lax.pcast(x, need, to="varying") if need else x
