"""Distributed pose-graph solve: edges sharded over the mesh, node
state replicated, gradient/H·v/diag-block contributions psum'd over ICI
(SURVEY.md §5 long-context row). Must match the single-device
matrix-free solver exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndt_slam_tpu.graph.pose_graph import (
    PoseGraph, empty_graph, make_sharded_optimize, optimize_pcg,
)


def _se2_between(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    dx, dy = b[0] - a[0], b[1] - a[1]
    th = np.arctan2(np.sin(b[2] - a[2]), np.cos(b[2] - a[2]))
    return np.array([c * dx + s * dy, -s * dx + c * dy, th], np.float32)


def _circle_graph(n_nodes=64, cap_edges=256, seed=0):
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n_nodes, endpoint=False)
    gt = np.stack(
        [10 * np.cos(th), 10 * np.sin(th), th + np.pi / 2], 1
    ).astype(np.float32)
    edges = [
        (i, i + 1,
         _se2_between(gt[i], gt[i + 1])
         + rng.normal(0, 0.01, 3).astype(np.float32),
         np.eye(3, dtype=np.float32) * 100)
        for i in range(n_nodes - 1)
    ]
    for (i, j) in [(0, n_nodes - 1), (5, 37), (12, 50)]:
        edges.append((i, j, _se2_between(gt[i], gt[j]),
                      np.eye(3, dtype=np.float32) * 400))
    E = len(edges)
    init = gt + rng.normal(0, 0.2, gt.shape).astype(np.float32)
    init[0] = gt[0]
    g = empty_graph(n_nodes, cap_edges)._replace(
        poses_rad=jnp.asarray(init),
        node_mask=jnp.ones(n_nodes, bool),
        idx_i=jnp.zeros(cap_edges, jnp.int32).at[:E].set(
            np.array([e[0] for e in edges], np.int32)),
        idx_j=jnp.zeros(cap_edges, jnp.int32).at[:E].set(
            np.array([e[1] for e in edges], np.int32)),
        z_rad=jnp.zeros((cap_edges, 3), jnp.float32).at[:E].set(
            np.stack([e[2] for e in edges])),
        omega=jnp.zeros((cap_edges, 3, 3), jnp.float32).at[:E].set(
            np.stack([e[3] for e in edges])),
        edge_mask=jnp.zeros(cap_edges, bool).at[:E].set(True),
    )
    return g, gt


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_sharded_pcg_matches_single_device():
    from jax.sharding import Mesh

    g, gt = _circle_graph()
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharded = make_sharded_optimize(mesh, "dp", iterations=15)
    ps, c2s = sharded(g)
    pp, c2p = optimize_pcg(g, iterations=15)
    # identical control flow + psum over deterministic shards: the two
    # must agree to fp noise
    np.testing.assert_allclose(
        np.asarray(ps), np.asarray(pp), atol=5e-4
    )
    n = len(gt)
    err = np.linalg.norm(
        np.asarray(ps)[:n, :2] - gt[:, :2], axis=1
    ).max()
    assert err < 0.25, err
