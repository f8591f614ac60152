#!/usr/bin/env python
"""Registration-step time breakdown on the current backend.

Times each stage of `pipeline/frontend._registration_step` in isolation
(jitted, block_until_ready-fenced, warm) at the bench.py operating
point, plus the full fused step, and derives a utilization estimate for
the pair-pass kernels. Writes a markdown table to stdout — the source
for BASELINE.md's breakdown (VERDICT r2 missing #4).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _room_scan(n, pose=(0.0, 0.0, 0.0), noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    tx, ty, th = pose
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    wa = angles + th
    dx, dy = np.cos(wa), np.sin(wa)
    t = np.full(n, np.inf)
    with np.errstate(divide="ignore"):
        for lim, comp, sgn in [(5.0, dx, 1), (-5.0, dx, -1),
                               (4.0, dy, 1), (-4.0, dy, -1)]:
            off = tx if comp is dx else ty
            tt = (lim - off) / comp
            tt = np.where((comp * sgn > 1e-9) & (tt > 0), tt, np.inf)
            t = np.minimum(t, tt)
    t = t + noise * rng.standard_normal(n)
    return np.stack([t * np.cos(angles), t * np.sin(angles)], 1).astype(np.float32)


def _time(fn, variants, reps=30):
    """Time fn over a list of pre-staged argument tuples, cycling so no
    two consecutive calls see identical inputs (the axon runtime
    memoizes byte-identical executions — bench.py's odo-variation trick
    generalized)."""
    import jax
    # warm on inputs OUTSIDE the timed set: warming on variants[:2] and
    # then timing variants[0..reps-1] would replay two byte-identical
    # calls the axon runtime serves from its memo (ADVICE r3).
    assert len(variants) >= reps + 2, (len(variants), reps)
    jax.block_until_ready([fn(*v) for v in variants[reps:reps + 2]])
    t0 = time.perf_counter()
    outs = [fn(*variants[i]) for i in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ndt_slam_tpu.config import SlamConfig
    from ndt_slam_tpu.core.points import PointBuffer, pad_points
    from ndt_slam_tpu.mapping.voxel import voxel_filter
    from ndt_slam_tpu.ndt.compact import compact_grid
    from ndt_slam_tpu.ndt.grid import build_grid
    from ndt_slam_tpu.ndt.pallas_kernels import (
        fitness_score_pallas, ndt_score_grad_hess_pallas, ndt_scores_pallas,
    )
    from ndt_slam_tpu.ndt.score import gauss_constants
    from ndt_slam_tpu.ndt.solve import align
    from ndt_slam_tpu.pipeline.frontend import _registration_step

    platform = jax.devices()[0].platform
    cfg = SlamConfig(
        grid_cells_x=192, grid_cells_y=192, ndt_min_points_per_cell=3,
        max_scan_points=2048, ndt_engine="pallas",
        ndt_max_active_cells=1024,
    )
    tgt_parts = [
        _room_scan(4321, pose=(0.2 * i, 0.1 * i, 0.05 * i), seed=i)
        for i in range(4)
    ]
    local = pad_points(np.concatenate(tgt_parts, 0), 32768)
    scan = pad_points(_room_scan(1081, pose=(0.05, 0.03, 0.02), seed=9),
                      2048)
    dev = jax.devices()[0]
    put = lambda x: jax.device_put(x, dev)
    scan_xy, scan_mask = put(scan.xy), put(scan.mask)
    local_xy, local_mask = put(local.xy), put(local.mask)
    odo = put(np.array([0.05, 0.03, 1.5], np.float32))
    zeros3 = put(np.zeros(3, np.float32))
    cov0 = put(np.eye(3, dtype=np.float32) * 1e-4)

    reps = args.reps
    rows = []
    # every rep distinct (the axon runtime memoizes identical calls);
    # +2 extra variants feed _time's out-of-set warmup
    V = reps + 2
    shifts = np.linspace(0.0, 1e-3, V).astype(np.float32)
    pose_vars = [put(np.array([s, s, s], np.float32)) for s in shifts]
    scan_vars = [put(np.asarray(scan.xy) + s) for s in shifts]
    center_vars = [put(np.array([s, s], np.float32)) for s in shifts]

    # dispatch-overhead floor: a trivial jitted op, distinct inputs
    triv = jax.jit(lambda x: x + 1.0)
    t_disp = _time(triv, [(p,) for p in pose_vars], reps=reps)
    rows.append(("(dispatch floor: trivial jit op)", t_disp, None))

    # full step
    def full(o):
        return _registration_step(cfg, scan_xy, scan_mask, o, zeros3,
                                  zeros3, cov0, local_xy, local_mask)
    t_full = _time(full, [(put(np.asarray(odo) + s),) for s in shifts],
                   reps=reps)
    it = int(np.asarray(full(odo).iterations))

    # stage: source voxel filter
    vf = jax.jit(lambda xy, m: voxel_filter(PointBuffer(xy, m),
                                            cfg.source_leaf_size))
    t_vox = _time(vf, [(x, scan_mask) for x in scan_vars], reps=reps)
    src = vf(scan_xy, scan_mask)
    n_src = int(np.asarray(src.count()))

    # stage: grid build (+ compaction)
    gb = jax.jit(lambda xy, m, c: build_grid(
        xy, m, c, cfg.grid_cells_x, cfg.grid_cells_y,
        cfg.ndt_resolution, min_pts=cfg.ndt_min_points_per_cell))
    t_grid = _time(gb, [(local_xy, local_mask, c) for c in center_vars],
                   reps=reps)
    grids = [gb(local_xy, local_mask, c) for c in center_vars]
    cgf = jax.jit(lambda g: compact_grid(g, cfg.ndt_max_active_cells))
    t_compact = _time(cgf, [(g,) for g in grids], reps=reps)
    cg = cgf(grids[0])
    k_valid = int(np.asarray(jnp.sum(cg.valid)))

    d1, d2 = gauss_constants(cfg.ndt_resolution, cfg.ndt_outlier_ratio)

    # stage: one fused sgh pass
    sgh = jax.jit(lambda p: ndt_score_grad_hess_pallas(
        p, src.xy, src.mask, cg, float(d1), float(d2), 1))
    t_sgh = _time(sgh, [(p,) for p in pose_vars], reps=reps)

    # stage: one 12-candidate line-search score pass
    sc = jax.jit(lambda p: ndt_scores_pallas(
        p, src.xy, src.mask, cg, float(d1), float(d2), 1))
    t_ls = _time(
        sc,
        [(put(np.full((12, 3), s, np.float32)),) for s in shifts],
        reps=reps,
    )

    # stage: whole Newton solve
    al = jax.jit(lambda p: align(
        p, src.xy, src.mask, cg, d1, d2,
        max_iterations=cfg.ndt_max_iterations,
        step_size=cfg.ndt_step_size, trans_eps=cfg.ndt_trans_eps,
        radius=1, use_pallas=True))
    t_align = _time(al, [(p,) for p in pose_vars], reps=reps)

    # stage: fitness NN pass
    fit = jax.jit(lambda xy, m: fitness_score_pallas(
        xy, m, local_xy, local_mask))
    t_fit = _time(fit, [(x, scan_mask) for x in scan_vars], reps=reps)

    N = src.xy.shape[0]           # padded pair-pass rows
    K = cfg.ndt_max_active_cells
    L = local.xy.shape[0]
    # pair-pass arithmetic (see _sgh_kernel): ~28 ops per (point, cell)
    flops_sgh = N * K * 28
    flops_ls = N * K * 12 * 14    # 12 candidates, ~14 ops each
    flops_fit = scan.xy.shape[0] * L * 5
    rows.append(("source voxel filter", t_vox, None))
    rows.append(("NDT grid build (131k-cap scatter)", t_grid, None))
    rows.append(("grid compaction (top-K)", t_compact, None))
    rows.append((f"one sgh pass (N={N}, K={K})", t_sgh,
                 flops_sgh / t_sgh))
    rows.append(("one 12-candidate line-search pass", t_ls,
                 flops_ls / t_ls))
    rows.append((f"Newton align (it={it})", t_align, None))
    rows.append((f"fitness NN (2048 x {L})", t_fit, flops_fit / t_fit))
    rows.append(("FULL fused step", t_full, None))

    print(f"platform: {platform}; reps={reps}; "
          f"n_src={n_src}, valid cells={k_valid}, iterations={it}")
    print("| stage | time [us] | eff. GFLOP/s |")
    print("|---|---|---|")
    for name, t, f in rows:
        fl = f"{f / 1e9:.0f}" if f else "—"
        print(f"| {name} | {t * 1e6:.0f} | {fl} |")
    acc = t_vox + t_grid + t_compact + t_align + t_fit
    print(f"(sum of stages ~ {acc * 1e6:.0f} us vs full "
          f"{t_full * 1e6:.0f} us; align includes {it}x(sgh+line search))")


if __name__ == "__main__":
    main()
