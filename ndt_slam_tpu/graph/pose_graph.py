"""SE(2) pose-graph optimization: batched Gauss-Newton on TPU.

The reference carries this subsystem as disabled scaffolding only
(PoseGraph/P2oDriver2D commented out, reference: src/FrontEnd.cpp:21-44,
CMakeLists.txt:74-87; SURVEY.md §0). Here it is first-class: the
long-context mechanism of SLAM (SURVEY.md §5) — loop-closure
constraints pull the whole trajectory back into global consistency.

TPU-first design:
- Fixed-capacity edge/node buffers (masked), so one jitted GN program
  serves every graph size up to capacity with no recompiles.
- Each GN iteration: all edge residuals/Jacobians in one batched pass
  (vmap), normal-equation assembly as segment-sum scatters into dense
  [3N, 3N] — an MXU/VPU-shaped dense solve (graphs are small: N x 3
  DoF; a 1024-node graph is a 3072^2 Cholesky, trivial on-chip).
- Gauge fixed by a strong prior on node 0 instead of deletion, keeping
  shapes static.
- Angles in radians internally; the public pipeline API stays degrees
  (reference convention, SURVEY.md §6.3 item 1).

Edge model (standard 2D pose-graph, Tomono-lineage LittleSLAM
formulation the reference descends from): edge (i, j) stores the
measured relative pose z_ij in frame i; residual is
  r = [R_i^T (t_j - t_i) - z_t,  wrap(th_j - th_i - z_th)]
weighted by the 3x3 information matrix Omega_ij.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PoseGraph(NamedTuple):
    """Fixed-capacity pose graph (all arrays device-resident).

    nodes:  poses_rad [N,3] (tx, ty, th_rad), node_mask [N]
    edges:  idx_i/idx_j [E] int32, z_rad [E,3] relative measurement,
            omega [E,3,3] information, edge_mask [E]
    """
    poses_rad: jnp.ndarray
    node_mask: jnp.ndarray
    idx_i: jnp.ndarray
    idx_j: jnp.ndarray
    z_rad: jnp.ndarray
    omega: jnp.ndarray
    edge_mask: jnp.ndarray

    @property
    def capacity_nodes(self) -> int:
        return self.poses_rad.shape[0]

    @property
    def capacity_edges(self) -> int:
        return self.idx_i.shape[0]


def empty_graph(max_nodes: int, max_edges: int) -> PoseGraph:
    return PoseGraph(
        poses_rad=jnp.zeros((max_nodes, 3), jnp.float32),
        node_mask=jnp.zeros((max_nodes,), bool),
        idx_i=jnp.zeros((max_edges,), jnp.int32),
        idx_j=jnp.zeros((max_edges,), jnp.int32),
        z_rad=jnp.zeros((max_edges, 3), jnp.float32),
        omega=jnp.zeros((max_edges, 3, 3), jnp.float32),
        edge_mask=jnp.zeros((max_edges,), bool),
    )


def _wrap(th):
    return jnp.arctan2(jnp.sin(th), jnp.cos(th))


def edge_residual(pose_i, pose_j, z):
    """r[3] for one edge; see module docstring."""
    c, s = jnp.cos(pose_i[2]), jnp.sin(pose_i[2])
    dx = pose_j[0] - pose_i[0]
    dy = pose_j[1] - pose_i[1]
    # R_i^T (t_j - t_i)
    rx = c * dx + s * dy
    ry = -s * dx + c * dy
    return jnp.array(
        [rx - z[0], ry - z[1], _wrap(pose_j[2] - pose_i[2] - z[2])]
    )


def _edge_jacobians(pose_i, pose_j):
    """(A[3,3], B[3,3]) = d r / d pose_i, d r / d pose_j."""
    c, s = jnp.cos(pose_i[2]), jnp.sin(pose_i[2])
    dx = pose_j[0] - pose_i[0]
    dy = pose_j[1] - pose_i[1]
    A = jnp.array([
        [-c, -s, -s * dx + c * dy],
        [s, -c, -c * dx - s * dy],
        [0.0, 0.0, -1.0],
    ])
    B = jnp.array([
        [c, s, 0.0],
        [-s, c, 0.0],
        [0.0, 0.0, 1.0],
    ])
    return A, B


@partial(jax.jit, static_argnames=("iterations",))
def optimize(
    graph: PoseGraph,
    iterations: int = 20,
    damping: float = 1e-6,
    anchor_weight: float = 1e8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton solve. Returns (poses_rad [N,3], final chi2).

    Node 0 is gauge-anchored at its current value via a strong prior.
    Invalid nodes get an identity prior so H stays SPD at full shape.
    """
    N = graph.capacity_nodes
    E = graph.capacity_edges

    res_fn = jax.vmap(edge_residual)
    jac_fn = jax.vmap(_edge_jacobians)

    def chi2_of(poses):
        r = res_fn(poses[graph.idx_i], poses[graph.idx_j], graph.z_rad)
        w = jnp.einsum("ei,eij,ej->e", r, graph.omega, r)
        return jnp.sum(jnp.where(graph.edge_mask, w, 0.0))

    anchor_pose = graph.poses_rad[0]

    def gn_step(_, poses):
        pi = poses[graph.idx_i]
        pj = poses[graph.idx_j]
        r = res_fn(pi, pj, graph.z_rad)                    # [E,3]
        A, B = jac_fn(pi, pj)                              # [E,3,3] x2
        m = graph.edge_mask.astype(jnp.float32)
        om = graph.omega * m[:, None, None]

        # Per-edge normal-equation blocks.
        AtO = jnp.einsum("eki,ekl->eil", A, om)            # A^T Omega
        BtO = jnp.einsum("eki,ekl->eil", B, om)
        H_ii = jnp.einsum("eil,elj->eij", AtO, A)
        H_ij = jnp.einsum("eil,elj->eij", AtO, B)
        H_jj = jnp.einsum("eil,elj->eij", BtO, B)
        b_i = jnp.einsum("eil,el->ei", AtO, r)
        b_j = jnp.einsum("eil,el->ei", BtO, r)

        # Scatter blocks into the dense [3N, 3N] system (segment sums
        # over flattened (block-row, block-col) ids).
        H = jnp.zeros((N, N, 3, 3), jnp.float32)
        H = H.at[graph.idx_i, graph.idx_i].add(H_ii)
        H = H.at[graph.idx_i, graph.idx_j].add(H_ij)
        H = H.at[graph.idx_j, graph.idx_i].add(
            jnp.swapaxes(H_ij, -1, -2)
        )
        H = H.at[graph.idx_j, graph.idx_j].add(H_jj)
        b = jnp.zeros((N, 3), jnp.float32)
        b = b.at[graph.idx_i].add(b_i)
        b = b.at[graph.idx_j].add(b_j)

        # Gauge anchor on node 0; identity prior on invalid nodes.
        eye = jnp.eye(3, dtype=jnp.float32)
        diag_prior = jnp.where(
            graph.node_mask[:, None, None],
            damping * eye[None],
            eye[None],
        )
        diag_prior = diag_prior.at[0].add(anchor_weight * eye)
        H = H.at[jnp.arange(N), jnp.arange(N)].add(diag_prior)
        b = b.at[0].add(anchor_weight * (poses[0] - anchor_pose))

        Hd = H.transpose(0, 2, 1, 3).reshape(3 * N, 3 * N)
        bd = b.reshape(3 * N)
        dx = jax.scipy.linalg.solve(Hd, -bd, assume_a="pos")
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0).reshape(N, 3)
        new_poses = poses + dx * graph.node_mask[:, None]
        new_poses = new_poses.at[:, 2].set(_wrap(new_poses[:, 2]))
        # Keep the step only if it reduces chi2 (plain GN can overshoot
        # on strongly nonlinear loops).
        better = chi2_of(new_poses) <= chi2_of(poses)
        return jnp.where(better, new_poses, poses)

    poses = jax.lax.fori_loop(0, iterations, gn_step, graph.poses_rad)
    return poses, chi2_of(poses)
