"""Pallas TPU kernels for the NDT hot loops.

Why these exist: the compact [N,K] broadcast engine (ndt/compact.py)
is semantically right for TPU but XLA materializes its [N,K]
intermediates in HBM — measured 1.86 ms for one score/grad/Hessian
pass whose inputs total ~100 KB and whose useful FLOPs are ~100 M.
The kernels here keep every [tile_n, K] pair intermediate in VMEM and
stream only the tiny inputs/outputs through HBM, turning the three hot
passes compute-bound:

- `sgh_pallas`: fused E / grad[3] / Hessian[3,3] / matched in ONE pass
  over (point x compact-cell) pairs (replaces PCL's per-iteration
  derivative loop, reference src/PoseEstimator.cpp:28, SURVEY.md §3.3).
- `score_many_pallas`: the batched line-search — C candidate poses
  scored in one kernel launch, table and points VMEM-resident across
  candidates (the TPU stand-in for More-Thuente, SURVEY.md §7.3 item 2).
- `nn_sq_dists_pallas`: brute-force nearest-neighbor distances with a
  VMEM-resident running min (replaces PCL getFitnessScore's KdTree,
  reference src/PoseEstimator.cpp:42-46). The MXU formulation
  (|s-t|^2 via dot) pads the K=2 contraction to 128 and wastes 64x of
  the systolic array; the VPU difference form is the fast path here.

Numerical semantics are IDENTICAL to ndt/compact.py and ndt/fitness.py
(same mixture constants, same md clamp, same window test); parity is
enforced by tests/unit/test_pallas_kernels.py. On non-TPU backends the
kernels run in Pallas interpreter mode, so the whole engine stays
testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ndt_slam_tpu.core.vma import vma_of
from ndt_slam_tpu.ndt.compact import CompactGrid

_TILE_N = 128          # point-tile (sublanes); [tile, K] temps stay in VMEM
_BIG = 1.0e12


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _out_struct(shape, *inputs):
    """ShapeDtypeStruct whose vma is the union of the inputs' varying
    axes — required inside shard_map (a pallas_call out_shape carries
    no vma by default and the check_vma typer rejects it)."""
    return jax.ShapeDtypeStruct(
        shape, jnp.float32, vma=frozenset(vma_of(*inputs))
    )


def _pad_rows(x, mult, fill=0.0):
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
    )


def _table_rows(cg: CompactGrid):
    """Compact table as an [8, K] row matrix (cells along lanes)."""
    return jnp.stack(
        [
            cg.kx, cg.ky, cg.mx, cg.my,
            cg.b00, cg.b01, cg.b11,
            cg.valid.astype(jnp.float32),
        ]
    )


def _point_features(pose_rad, xy, mask, cg: CompactGrid):
    """Per-point arrays the pair pass needs (all [N])."""
    c, s = jnp.cos(pose_rad[2]), jnp.sin(pose_rad[2])
    px = c * xy[:, 0] - s * xy[:, 1] + pose_rad[0]
    py = s * xy[:, 0] + c * xy[:, 1] + pose_rad[1]
    fx = jnp.floor((px - cg.origin[0]) / cg.resolution)
    fy = jnp.floor((py - cg.origin[1]) / cg.resolution)
    a = -s * xy[:, 0] - c * xy[:, 1]
    b = c * xy[:, 0] - s * xy[:, 1]
    m = mask.astype(jnp.float32)
    return px, py, fx, fy, a, b, m


# --------------------------------------------------------------------------
# Fused score / gradient / Hessian
# --------------------------------------------------------------------------
#
# The kernel does the O(N*K) pair pass entirely in VMEM and emits
# PER-POINT partial sums [N, 8]; the O(N) epilogue contractions with the
# pose-dependent per-point features (a, b, ...) run as ordinary XLA ops
# and fuse. Per-point outputs (regular VMEM tiles, no cross-grid-step
# accumulation) are what makes the kernel batchable: jax.vmap's pallas
# batching rule adds a leading grid dimension, which Mosaic only
# supports for tile-regular outputs (an SMEM scalar accumulator output
# is rejected: its squeezed block fails the (8, 128) divisibility rule).

def _sgh_kernel(f_ref, t_ref, o_ref, *, d1, d2, radius):
    F = f_ref[:]                           # [TILE, 5]
    fx, fy = F[:, 0:1], F[:, 1:2]          # [TILE, 1]
    px, py = F[:, 2:3], F[:, 3:4]
    m = F[:, 4:5]

    kx = t_ref[0:1, :]                     # [1, K]
    ky = t_ref[1:2, :]
    mx, my = t_ref[2:3, :], t_ref[3:4, :]
    b00, b01, b11 = t_ref[4:5, :], t_ref[5:6, :], t_ref[6:7, :]
    tv = t_ref[7:8, :]

    r = jnp.float32(radius)
    in_win = (jnp.abs(fx - kx) <= r) & (jnp.abs(fy - ky) <= r)
    w = jnp.where(in_win, m * tv, 0.0)     # [TILE, K]

    qx = px - mx
    qy = py - my
    bqx = b00 * qx + b01 * qy
    bqy = b01 * qx + b11 * qy
    md = qx * bqx + qy * bqy
    e = w * jnp.exp(-0.5 * d2 * jnp.minimum(md, 50.0 / d2))

    coef = (-d1 * d2) * e
    cols = (
        d1 * jnp.sum(e, axis=1, keepdims=True),            # E per point
        jnp.sum(w, axis=1, keepdims=True),                 # matched
        jnp.sum(coef * bqx, axis=1, keepdims=True),        # gqx
        jnp.sum(coef * bqy, axis=1, keepdims=True),        # gqy
        jnp.sum(coef * (b00 - d2 * bqx * bqx), axis=1, keepdims=True),
        jnp.sum(coef * (b01 - d2 * bqx * bqy), axis=1, keepdims=True),
        jnp.sum(coef * (b11 - d2 * bqy * bqy), axis=1, keepdims=True),
        jnp.zeros_like(m),                                 # pad to 8
    )
    o_ref[:] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("d1", "d2", "radius"))
def _sgh_call(feats, table, d1, d2, radius):
    nb = feats.shape[0] // _TILE_N
    return pl.pallas_call(
        functools.partial(_sgh_kernel, d1=d1, d2=d2, radius=radius),
        grid=(nb,),
        out_shape=_out_struct((feats.shape[0], 8), feats, table),
        in_specs=[
            pl.BlockSpec(
                (_TILE_N, feats.shape[1]), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_N, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(feats, table)


def ndt_score_grad_hess_pallas(
    pose_rad, xy, mask, cg: CompactGrid, d1: float, d2: float,
    radius: int = 1,
):
    """Drop-in for ndt_score_grad_hess_compact: (E, grad, hess, matched)."""
    px, py, fx, fy, a, b, m = _point_features(pose_rad, xy, mask, cg)
    feats = jnp.stack((fx, fy, px, py, m), axis=1)
    feats = _pad_rows(feats, _TILE_N)
    table = _table_rows(cg)
    s = _sgh_call(feats, table, float(d1), float(d2), int(radius))
    n = xy.shape[0]
    e_pt, m_pt = s[:n, 0], s[:n, 1]
    gqx, gqy = s[:n, 2], s[:n, 3]
    h00p, h01p, h11p = s[:n, 4], s[:n, 5], s[:n, 6]

    E = jnp.sum(e_pt)
    matched = jnp.sum(m_pt)
    g0 = jnp.sum(gqx)
    g1 = jnp.sum(gqy)
    g2 = jnp.sum(a * gqx + b * gqy)
    grad = jnp.stack([g0, g1, g2])

    d2x = pose_rad[0] - px
    d2y = pose_rad[1] - py
    h00 = jnp.sum(h00p)
    h01 = jnp.sum(h01p)
    h11 = jnp.sum(h11p)
    h02 = jnp.sum(a * h00p + b * h01p)
    h12 = jnp.sum(a * h01p + b * h11p)
    h22 = (
        jnp.sum(a * a * h00p + 2.0 * a * b * h01p + b * b * h11p)
        + jnp.sum(gqx * d2x + gqy * d2y)
    )
    hess = jnp.stack(
        [
            jnp.stack([h00, h01, h02]),
            jnp.stack([h01, h11, h12]),
            jnp.stack([h02, h12, h22]),
        ]
    )
    return E, grad, hess, matched


# --------------------------------------------------------------------------
# Batched candidate scores (line search)
# --------------------------------------------------------------------------

def _score_many_kernel(f_ref, m_ref, t_ref, o_ref, *, n_cand, d1, d2, radius):
    F = f_ref[:]                           # [TILE, 4*C]
    m = m_ref[:]                           # [TILE, 1]
    kx = t_ref[0:1, :]
    ky = t_ref[1:2, :]
    mx, my = t_ref[2:3, :], t_ref[3:4, :]
    b00, b01, b11 = t_ref[4:5, :], t_ref[5:6, :], t_ref[6:7, :]
    tv = t_ref[7:8, :]
    r = jnp.float32(radius)
    mtv = m * tv                           # [TILE, K]

    cols = []
    for c in range(n_cand):                # static unroll; table stays hot
        fx = F[:, 4 * c + 0 : 4 * c + 1]
        fy = F[:, 4 * c + 1 : 4 * c + 2]
        px = F[:, 4 * c + 2 : 4 * c + 3]
        py = F[:, 4 * c + 3 : 4 * c + 4]
        in_win = (jnp.abs(fx - kx) <= r) & (jnp.abs(fy - ky) <= r)
        w = jnp.where(in_win, mtv, 0.0)
        qx = px - mx
        qy = py - my
        bqx = b00 * qx + b01 * qy
        bqy = b01 * qx + b11 * qy
        md = qx * bqx + qy * bqy
        e = w * jnp.exp(-0.5 * d2 * jnp.minimum(md, 50.0 / d2))
        cols.append(d1 * jnp.sum(e, axis=1, keepdims=True))  # [TILE, 1]
    # per-point per-candidate partial scores (see _sgh_kernel for why
    # per-point VMEM outputs instead of an SMEM accumulator)
    o_ref[:] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("n_cand", "d1", "d2", "radius"))
def _score_many_call(feats, m_col, table, n_cand, d1, d2, radius):
    nb = feats.shape[0] // _TILE_N
    ncol = feats.shape[1]
    out = pl.pallas_call(
        functools.partial(
            _score_many_kernel, n_cand=n_cand, d1=d1, d2=d2, radius=radius
        ),
        grid=(nb,),
        out_shape=_out_struct((feats.shape[0], n_cand), feats, m_col, table),
        in_specs=[
            pl.BlockSpec(
                (_TILE_N, ncol), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_N, n_cand), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(feats, m_col, table)
    return jnp.sum(out, axis=0)            # [C] (XLA epilogue reduction)


def ndt_scores_pallas(
    poses_rad, xy, mask, cg: CompactGrid, d1: float, d2: float,
    radius: int = 1,
):
    """E(p) for a batch of candidate poses [C,3] in one kernel launch."""
    n_cand = poses_rad.shape[0]
    assert n_cand <= 128, n_cand
    cos = jnp.cos(poses_rad[:, 2])         # [C]
    sin = jnp.sin(poses_rad[:, 2])
    px = cos[:, None] * xy[None, :, 0] - sin[:, None] * xy[None, :, 1] \
        + poses_rad[:, 0:1]                # [C, N]
    py = sin[:, None] * xy[None, :, 0] + cos[:, None] * xy[None, :, 1] \
        + poses_rad[:, 1:2]
    fx = jnp.floor((px - cg.origin[0]) / cg.resolution)
    fy = jnp.floor((py - cg.origin[1]) / cg.resolution)
    # interleave per candidate: [N, 4C] columns (fx, fy, px, py) * C
    feats = jnp.stack([fx, fy, px, py], axis=-1)       # [C, N, 4]
    feats = jnp.transpose(feats, (1, 0, 2)).reshape(xy.shape[0], -1)
    feats = _pad_rows(feats, _TILE_N)
    m_col = _pad_rows(mask.astype(jnp.float32)[:, None], _TILE_N)
    table = _table_rows(cg)
    return _score_many_call(
        feats, m_col, table, int(n_cand), float(d1), float(d2), int(radius)
    )


# --------------------------------------------------------------------------
# Nearest-neighbor squared distances (fitness)
# --------------------------------------------------------------------------

def _nn_kernel(s_ref, t_ref, o_ref):
    j = pl.program_id(1)
    S = s_ref[:]                            # [TILE, 2]
    sx, sy = S[:, 0:1], S[:, 1:2]
    tx = t_ref[0:1, :]                      # [1, TC]
    ty = t_ref[1:2, :]
    tv = t_ref[2:3, :]
    dx = sx - tx
    dy = sy - ty
    d2 = dx * dx + dy * dy
    d2 = jnp.where(tv > 0.0, d2, _BIG)
    best = jnp.min(d2, axis=1, keepdims=True)   # [TILE, 1]

    @pl.when(j == 0)
    def _():
        o_ref[:] = best

    @pl.when(j > 0)
    def _():
        o_ref[:] = jnp.minimum(o_ref[:], best)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _nn_call(src2, tgt_rows, chunk):
    ns = src2.shape[0] // _TILE_N
    nt = tgt_rows.shape[1] // chunk
    out = pl.pallas_call(
        _nn_kernel,
        grid=(ns, nt),
        out_shape=_out_struct((src2.shape[0], 1), src2, tgt_rows),
        in_specs=[
            pl.BlockSpec(
                (_TILE_N, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(src2, tgt_rows)
    return out[:, 0]


def nn_sq_dists_pallas(
    src_xy, src_mask, tgt_xy, tgt_mask, chunk: int = 2048,
):
    """Per-source squared distance to nearest valid target ([N], _BIG
    where the source is masked or no target exists). Drop-in for
    ndt/fitness.nn_sq_dists on one device."""
    n = src_xy.shape[0]
    src2 = _pad_rows(src_xy.astype(jnp.float32), _TILE_N)
    m = tgt_xy.shape[0]
    chunk = min(chunk, max(128, m))
    pad = (-m) % chunk
    tgt_rows = jnp.zeros((8, m + pad), jnp.float32)
    tgt_rows = tgt_rows.at[0, :m].set(tgt_xy[:, 0])
    tgt_rows = tgt_rows.at[1, :m].set(tgt_xy[:, 1])
    tgt_rows = tgt_rows.at[2, :m].set(tgt_mask.astype(jnp.float32))
    best = _nn_call(src2, tgt_rows, int(chunk))[:n]
    best = jnp.maximum(best, 0.0)
    return jnp.where(src_mask, best, _BIG)


def fitness_score_pallas(src_xy, src_mask, tgt_xy, tgt_mask):
    """Mean squared NN distance (PCL getFitnessScore semantics), with
    the NN pass as a Pallas kernel. Single-device only — the sharded
    fitness variants live in ndt/fitness.py."""
    d2 = nn_sq_dists_pallas(src_xy, src_mask, tgt_xy, tgt_mask)
    n = jnp.sum(src_mask.astype(jnp.float32))
    have_tgt = jnp.any(tgt_mask)
    total = jnp.sum(jnp.where(src_mask, d2, 0.0))
    mean = total / jnp.maximum(n, 1.0)
    return jnp.where((n > 0) & have_tgt, mean, _BIG)
