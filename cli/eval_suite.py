#!/usr/bin/env python
"""Multi-sequence evaluation suite: run SLAM over several logs/configs
and tabulate ATE/accept-rate side by side.

Input: a JSON manifest, e.g.

  [
    {"name": "office", "log": "tests/data/office_loop.clf",
     "format": "carmen", "gt": "tests/data/office_loop.gt",
     "overrides": {"loop_enable": true}},
    {"name": "sim120", "simulate": 120}
  ]

Each entry runs the full pipeline (pipeline/runner.run_slam) and, when
ground truth is available (a `gt` file or the simulator's true poses),
reports SE(2)-aligned ATE RMSE. Results go to <out>/suite.json and a
markdown table on stdout — the regression harness the reference never
had (SURVEY.md §4: no tests, no benchmarks, manual rviz eyeballing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def run_entry(entry: dict, out_root: str, verbose: bool) -> dict:
    from ndt_slam_tpu.config import SlamConfig
    from ndt_slam_tpu.metrics import ate_rmse
    from ndt_slam_tpu.pipeline.runner import run_slam

    name = entry["name"]
    cfg = SlamConfig().replace(**entry.get("overrides", {}))
    true_poses = None
    if "simulate" in entry:
        from ndt_slam_tpu.io.simulate import simulate_sequence
        frames = simulate_sequence(n_frames=int(entry["simulate"]),
                                   seed=int(entry.get("seed", 0)))
        true_poses = np.asarray([f.true_pose for f in frames])
        cfg = cfg.replace(end_frame=max(cfg.end_frame, len(frames)))
    else:
        fmt = entry.get("format", "tsukuba")
        if fmt == "carmen":
            from ndt_slam_tpu.io import native
            from ndt_slam_tpu.io.carmen import read_carmen_log
            frames = native.read_carmen_log(entry["log"])
            if frames is None:
                frames = read_carmen_log(entry["log"])
        else:
            from ndt_slam_tpu.io import native
            from ndt_slam_tpu.io.tsukuba import read_tsukuba_log
            frames = native.read_tsukuba_log(
                entry["log"], sidelidar=cfg.sidelidar
            )
            if frames is None:
                frames = read_tsukuba_log(
                    entry["log"], sidelidar=cfg.sidelidar
                )
        if "gt" in entry:
            from ndt_slam_tpu.io.carmen import read_carmen_gt
            true_poses = read_carmen_gt(entry["gt"])

    out_dir = os.path.join(out_root, name)
    t0 = time.perf_counter()
    fe = run_slam(
        frames, cfg, out_dir=out_dir,
        metrics_path=os.path.join(out_dir, "metrics.jsonl"),
        verbose=verbose,
    )
    wall = time.perf_counter() - t0

    n = len(fe.pose_history)
    rec = {
        "name": name,
        "frames": n,
        "wall_s": round(wall, 2),
        "scans_per_s": round(n / max(wall, 1e-9), 3),
        "accept_rate": (
            round(float(np.mean([
                1.0 if m.get("successful") else 0.0 for m in fe.metrics
            ])), 4) if fe.metrics else 0.0
        ),
        "loops_accepted": (
            fe.backend.loops_accepted if fe.backend is not None else None
        ),
    }
    if true_poses is not None and n:
        rec["ate_rmse_m"] = round(
            float(ate_rmse(fe.get_poses(), true_poses[:n])), 4
        )
    if "expect_ate_below" in entry and "ate_rmse_m" in rec:
        # regression gate: the manifest pins an expected ATE bound;
        # main() exits nonzero when any entry exceeds its bound
        rec["ate_bound_m"] = float(entry["expect_ate_below"])
        rec["ate_ok"] = rec["ate_rmse_m"] <= rec["ate_bound_m"]
    return rec


def _load_frames(entry: dict, cfg):
    if "simulate" in entry:
        from ndt_slam_tpu.io.simulate import simulate_sequence
        return simulate_sequence(n_frames=int(entry["simulate"]),
                                 seed=int(entry.get("seed", 0)))
    fmt = entry.get("format", "tsukuba")
    from ndt_slam_tpu.io import native
    if fmt == "carmen":
        from ndt_slam_tpu.io.carmen import read_carmen_log
        frames = native.read_carmen_log(entry["log"])
        return frames if frames is not None else read_carmen_log(
            entry["log"]
        )
    from ndt_slam_tpu.io.tsukuba import read_tsukuba_log
    frames = native.read_tsukuba_log(entry["log"], sidelidar=cfg.sidelidar)
    return frames if frames is not None else read_tsukuba_log(
        entry["log"], sidelidar=cfg.sidelidar
    )


def run_lockstep(entries, out_root: str, verbose: bool) -> list:
    """All entries in ONE lockstep batch (pipeline/batch_runner): every
    frame tick runs a single batched device program across all
    sequences. Requires a shared config (the first entry's overrides)."""
    from ndt_slam_tpu.config import SlamConfig
    from ndt_slam_tpu.metrics import ate_rmse
    from ndt_slam_tpu.pipeline.batch_runner import run_slam_batch

    cfg = SlamConfig().replace(**entries[0].get("overrides", {}))
    seqs = [_load_frames(e, cfg) for e in entries]
    gts = []
    for e, s in zip(entries, seqs):
        if "simulate" in e:
            gts.append(np.asarray([f.true_pose for f in s]))
        elif "gt" in e:
            from ndt_slam_tpu.io.carmen import read_carmen_gt
            gts.append(read_carmen_gt(e["gt"]))
        else:
            gts.append(None)

    t0 = time.perf_counter()
    fes = run_slam_batch(seqs, cfg, verbose=verbose)
    wall = time.perf_counter() - t0
    total = sum(len(fe.pose_history) for fe in fes)

    rows = []
    for e, fe, gt in zip(entries, fes, gts):
        n = len(fe.pose_history)
        rec = {
            "name": e["name"], "frames": n,
            "accept_rate": (
                round(float(np.mean([
                    1.0 if m.get("successful") else 0.0
                    for m in fe.metrics
                ])), 4) if fe.metrics else 0.0
            ),
        }
        if gt is not None and n:
            rec["ate_rmse_m"] = round(
                float(ate_rmse(fe.get_poses(), gt[:n])), 4
            )
        out_dir = os.path.join(out_root, e["name"])
        os.makedirs(out_dir, exist_ok=True)
        np.savetxt(os.path.join(out_dir, "poses_full.txt"),
                   fe.get_poses(), fmt="%.6f")
        rows.append(rec)
    rows.append({
        "name": "(aggregate)", "frames": total,
        "wall_s": round(wall, 2),
        "scans_per_s": round(total / max(wall, 1e-9), 3),
    })
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("manifest", help="JSON list of suite entries")
    ap.add_argument("--out", required=True, help="output root directory")
    ap.add_argument("--cpu", action="store_true", help="force CPU JAX")
    ap.add_argument("--lockstep", action="store_true",
                    help="run ALL entries as one lockstep batch "
                         "(shared config; aggregate throughput)")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    with open(args.manifest) as f:
        entries = json.load(f)
    os.makedirs(args.out, exist_ok=True)

    rows = []
    if args.lockstep:
        rows = run_lockstep(entries, args.out, args.verbose)
        for r in rows:
            print(json.dumps(r), flush=True)
    else:
        for entry in entries:
            rows.append(run_entry(entry, args.out, args.verbose))
            print(json.dumps(rows[-1]), flush=True)

    with open(os.path.join(args.out, "suite.json"), "w") as f:
        json.dump(rows, f, indent=2)

    cols = ["name", "frames", "ate_rmse_m", "accept_rate",
            "loops_accepted", "scans_per_s", "wall_s"]
    print("\n| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r.get(c, "—")) for c in cols) + " |")

    failed = [r for r in rows if r.get("ate_ok") is False]
    if failed:
        for r in failed:
            print(f"REGRESSION: {r['name']} ATE {r['ate_rmse_m']} > "
                  f"bound {r['ate_bound_m']}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
