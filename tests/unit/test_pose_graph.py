"""Pose-graph GN: residual conventions, drift correction, masking."""

import numpy as np
import jax.numpy as jnp

from ndt_slam_tpu.graph.pose_graph import (
    PoseGraph, edge_residual, empty_graph, optimize,
)


def _se2_compose(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array([
        a[0] + c * b[0] - s * b[1],
        a[1] + s * b[0] + c * b[1],
        a[2] + b[2],
    ])


def _se2_between(a, b):
    """b expressed in a's frame."""
    c, s = np.cos(a[2]), np.sin(a[2])
    dx, dy = b[0] - a[0], b[1] - a[1]
    return np.array([c * dx + s * dy, -s * dx + c * dy, b[2] - a[2]])


def test_edge_residual_zero_at_truth():
    a = jnp.array([1.0, 2.0, 0.3])
    b = jnp.array([2.5, 2.2, 0.9])
    z = jnp.asarray(_se2_between(np.asarray(a), np.asarray(b)), jnp.float32)
    r = edge_residual(a, b, z)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)


def _ring_graph(n_nodes=40, drift=0.02, seed=0, max_nodes=64, max_edges=128):
    """Ground truth: a circle. Odometry edges get biased (drifting)
    measurements; one loop-closure edge ties last node to first."""
    rng = np.random.default_rng(seed)
    radius = 5.0
    dth = 2 * np.pi / n_nodes
    true = np.zeros((n_nodes, 3))
    for k in range(1, n_nodes):
        th = k * dth
        true[k] = [radius * np.sin(th), radius * (1 - np.cos(th)), th]

    # drifting initial guess: integrate noisy odometry
    est = np.zeros((n_nodes, 3))
    edges = []
    for k in range(1, n_nodes):
        z = _se2_between(true[k - 1], true[k])
        zn = z + rng.normal(0, drift, 3) * [1, 1, 0.5]
        est[k] = _se2_compose(est[k - 1], zn)
        edges.append((k - 1, k, z + rng.normal(0, drift * 0.2, 3), 1e2))
    # loop closure: strong, unbiased
    edges.append((n_nodes - 1, 0, _se2_between(true[-1], true[0]), 1e4))

    g = empty_graph(max_nodes, max_edges)
    poses = np.zeros((max_nodes, 3), np.float32)
    poses[:n_nodes] = est
    nm = np.zeros(max_nodes, bool); nm[:n_nodes] = True
    E = len(edges)
    ii = np.zeros(128, np.int32); jj = np.zeros(128, np.int32)
    zz = np.zeros((128, 3), np.float32)
    om = np.zeros((128, 3, 3), np.float32)
    em = np.zeros(128, bool)
    for e, (i, j, z, w) in enumerate(edges):
        ii[e], jj[e] = i, j
        zz[e] = z
        om[e] = np.eye(3) * w
        em[e] = True
    return PoseGraph(
        poses_rad=jnp.asarray(poses), node_mask=jnp.asarray(nm),
        idx_i=jnp.asarray(ii), idx_j=jnp.asarray(jj),
        z_rad=jnp.asarray(zz), omega=jnp.asarray(om),
        edge_mask=jnp.asarray(em),
    ), true, est


def test_loop_closure_corrects_drift():
    g, true, est = _ring_graph()
    n = len(true)
    err_before = np.linalg.norm(est[:, :2] - true[:, :2], axis=1).max()
    poses, chi2 = optimize(g, iterations=15)
    out = np.asarray(poses)[:n]
    err_after = np.linalg.norm(out[:, :2] - true[:, :2], axis=1).max()
    assert err_after < 0.5 * err_before, (err_before, err_after)
    assert float(chi2) >= 0.0 and np.isfinite(float(chi2))
    # anchor held
    np.testing.assert_allclose(out[0], est[0], atol=1e-4)


def test_masked_edges_and_nodes_ignored():
    g, true, _ = _ring_graph()
    poses1, chi1 = optimize(g, iterations=10)
    # appending garbage in masked slots must not change the solution
    g2 = g._replace(
        z_rad=g.z_rad.at[100].set(jnp.array([50.0, -3.0, 2.0])),
        omega=g.omega.at[100].set(jnp.eye(3) * 1e6),
    )
    poses2, chi2 = optimize(g2, iterations=10)
    np.testing.assert_allclose(
        np.asarray(poses1), np.asarray(poses2), atol=1e-6
    )
