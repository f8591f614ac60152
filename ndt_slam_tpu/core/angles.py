"""Angle algebra in degrees, wrapped to [-180, 180).

The reference keeps headings in degrees end-to-end and wraps to
[-180, 180) (reference: src/MyUtil.cpp:4-23). We preserve those
semantics at the API boundary; NDT internals work in radians.

All functions are jnp-native and batch over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_DEG2RAD = np.pi / 180.0
_RAD2DEG = 180.0 / np.pi


def wrap_deg(a):
    """Wrap angle(s) in degrees to [-180, 180)."""
    return (a + 180.0) % 360.0 - 180.0


def add_deg(a1, a2):
    """a1 + a2, wrapped (reference: MyUtil::add_angle)."""
    return wrap_deg(a1 + a2)


def sub_deg(a1, a2):
    """a1 - a2, wrapped (reference: MyUtil::sub_angle)."""
    return wrap_deg(a1 - a2)


def deg2rad(a):
    return a * _DEG2RAD


def rad2deg(a):
    return a * _RAD2DEG


def wrap_rad(a):
    """Wrap angle(s) in radians to [-pi, pi)."""
    return (a + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
