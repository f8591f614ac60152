"""Resampler semantics tests (reference: src/ScanPointResampler.cpp:4-62)."""

import numpy as np
import jax.numpy as jnp

from ndt_slam_tpu.pre import resample_points_np, resample_points_jax
from ndt_slam_tpu.core.points import pad_points


def _spacings(pts):
    d = np.diff(pts, axis=0)
    return np.hypot(d[:, 0], d[:, 1])


def test_dense_line_resampled_to_space():
    # 1000 points at 0.01 m spacing -> output at ~0.05 m spacing
    x = np.linspace(0.0, 9.99, 1000)
    pts = np.stack([x, np.zeros_like(x)], axis=1)
    out = resample_points_np(pts, space=0.05, space_thre=0.25)
    sp = _spacings(out)
    assert np.all(np.abs(sp - 0.05) < 1e-6)


def test_sparse_line_subdivided():
    # points at 0.12 m spacing (< space_thre): interpolated to 0.05
    x = np.arange(0.0, 1.2, 0.12)
    pts = np.stack([x, np.zeros_like(x)], axis=1)
    out = resample_points_np(pts, space=0.05, space_thre=0.25)
    sp = _spacings(out)
    assert np.all(sp <= 0.05 + 1e-6)


def test_gap_keeps_raw_point():
    # a 1.0 m jump (>= space_thre) keeps the far point verbatim
    pts = np.array([[0.0, 0.0], [0.03, 0.0], [1.03, 0.0]])
    out = resample_points_np(pts, space=0.05, space_thre=0.25)
    assert np.any(np.all(np.isclose(out, [1.03, 0.0], atol=1e-9), axis=1))


def test_first_point_kept():
    pts = np.array([[0.5, 0.5], [0.52, 0.5]])
    out = resample_points_np(pts, space=0.05, space_thre=0.25)
    assert np.allclose(out[0], [0.5, 0.5])


def test_jax_matches_numpy():
    rng = np.random.default_rng(0)
    ang = np.linspace(0, 2 * np.pi, 360, endpoint=False)
    r = 3.0 + 0.2 * rng.standard_normal(360).cumsum() * 0.01
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)

    ref = resample_points_np(pts, 0.05, 0.25)
    buf = pad_points(pts, 512)
    xy, mask = resample_points_jax(buf.xy, buf.mask, 0.05, 0.25)
    n = int(jnp.sum(mask))
    got = np.asarray(xy[:n])
    assert n == ref.shape[0], (n, ref.shape[0])
    assert np.allclose(got, ref, atol=1e-4)


def test_jax_empty_scan():
    buf = pad_points(np.zeros((0, 2)), 64)
    xy, mask = resample_points_jax(buf.xy, buf.mask, 0.05, 0.25)
    assert int(jnp.sum(mask)) == 0
