"""Host driver loop (the reference's SlamLauncher, SURVEY.md §3.1):
feed frames from a log/simulator into the FrontEnd, write outputs.
"""

from __future__ import annotations

import os
import time
from typing import Iterable, Optional

import numpy as np

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.pipeline.frontend import FrontEnd
from ndt_slam_tpu.io.traj import save_poses_reference_format, save_poses_full
from ndt_slam_tpu.io.pcd import save_pcd
from ndt_slam_tpu.metrics import JsonlWriter


def run_slam(
    frames: Iterable,
    cfg: SlamConfig,
    out_dir: Optional[str] = None,
    metrics_path: Optional[str] = None,
    verbose: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    profile_dir: Optional[str] = None,
    mesh=None,
    checkpoint_save: bool = True,
    viz_every: int = 0,
    viz_final: bool = False,
) -> FrontEnd:
    """Run the full pipeline over frames (objects with .odo_pose and
    .scan_xy, e.g. io.simulate.Frame or io.tsukuba.LogFrame).

    Mirrors SlamLauncher::loop_wait: stop after cfg.end_frame frames,
    then write the pose file and the global + per-submap PCD maps.

    Beyond the reference (which only writes final outputs,
    src/SlamLauncher.cpp:113-126): with `checkpoint_path` the complete
    SLAM state is saved every `checkpoint_every` frames (and at the
    end); with `resume=True` an existing checkpoint is loaded and the
    already-processed prefix of `frames` is skipped, resuming exactly.
    With `profile_dir`, the run is wrapped in a `jax.profiler` trace.
    """
    pipelined = cfg.resolved_pipeline_depth > 0
    resume_skip = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        from ndt_slam_tpu.pipeline.checkpoint import load_checkpoint
        fe = load_checkpoint(checkpoint_path, cfg, mesh=mesh)
        resume_skip = fe.cnt
        if verbose:
            print(f"[runner] resumed from {checkpoint_path} "
                  f"(frames processed: {resume_skip})")
    elif pipelined:
        from ndt_slam_tpu.pipeline.async_frontend import PipelinedFrontEnd
        fe = PipelinedFrontEnd(cfg, mesh=mesh)
    else:
        fe = FrontEnd(cfg, mesh=mesh)
    pipelined = pipelined and hasattr(fe, "drain")
    if checkpoint_path and checkpoint_every:
        from ndt_slam_tpu.pipeline.checkpoint import save_checkpoint
    profiling = False
    if profile_dir:
        import jax
        jax.profiler.start_trace(profile_dir)
        profiling = True
    # On resume, append: truncating would lose the pre-checkpoint
    # per-frame records even though fe.metrics was restored intact.
    jl = JsonlWriter(metrics_path, append=resume_skip > 0)
    # viz_every < 0 = "reference cadence": render every cfg.draw_skip
    # frames, the rviz map-publish period (src/SlamLauncher.cpp:130-135)
    if viz_every < 0:
        viz_every = max(1, cfg.draw_skip)
    t0 = time.perf_counter()
    n = 0
    try:
        for cnt, fr in enumerate(frames, start=1):
            if cnt > cfg.end_frame:
                break
            sid = getattr(fr, "sid", None)
            if sid is None:
                sid = getattr(fr, "stamp", cnt - 1)
            # On resume, skip the prefix the checkpoint already covers:
            # fe.cnt counts only frames past start_frame, and frames
            # below start_frame are no-ops either way.
            if sid < cfg.start_frame:
                continue
            if n < resume_skip:
                n += 1
                continue
            if pipelined:
                # records resolve in chunks, up to `depth` frames late
                for rec in fe.process(fr.scan_xy, fr.odo_pose, sid=sid):
                    rec["wall_s"] = time.perf_counter() - t0
                    jl.write(rec)
            else:
                rec = fe.process(fr.scan_xy, fr.odo_pose, sid=sid)
                rec["wall_s"] = time.perf_counter() - t0
                jl.write(rec)
            n += 1
            if checkpoint_path and checkpoint_every and checkpoint_save \
                    and n % checkpoint_every == 0:
                if pipelined:  # checkpoint needs canonical host state
                    for rec in fe.drain():
                        rec["wall_s"] = time.perf_counter() - t0
                        jl.write(rec)
                save_checkpoint(fe, checkpoint_path)
            if viz_every and out_dir and n % viz_every == 0:
                from ndt_slam_tpu.viz import render_frontend_png
                os.makedirs(out_dir, exist_ok=True)
                render_frontend_png(
                    os.path.join(out_dir, f"viz_{n:05d}.png"), fe
                )
            if verbose and cnt % 50 == 0 and not pipelined:
                print(f"[runner] frame {cnt} cost={rec.get('cost', 0):.4f} "
                      f"ok={rec.get('successful')}")
            elif verbose and cnt % 50 == 0:
                print(f"[runner] frame {cnt} (pipelined, "
                      f"{len(fe.pose_history)} resolved)")
        if pipelined:
            for rec in fe.drain():
                rec["wall_s"] = time.perf_counter() - t0
                jl.write(rec)
    finally:
        if profiling:
            import jax
            jax.profiler.stop_trace()
        jl.close()
    fe.finalize()  # apply any deferred loop-closure correction
    if checkpoint_path and checkpoint_save and n > resume_skip:
        from ndt_slam_tpu.pipeline.checkpoint import save_checkpoint
        save_checkpoint(fe, checkpoint_path)

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        poses = fe.get_poses()
        save_poses_reference_format(os.path.join(out_dir, "poses.txt"), poses)
        save_poses_full(os.path.join(out_dir, "poses_full.txt"), poses)
        save_pcd(os.path.join(out_dir, "map.pcd"), fe.pcmap.global_map())
        for i, sm in enumerate(fe.pcmap.submap_clouds()):
            save_pcd(os.path.join(out_dir, f"submap_{i:03d}.pcd"), sm)
        if viz_final or viz_every:
            from ndt_slam_tpu.viz import render_frontend_png
            render_frontend_png(os.path.join(out_dir, "map.png"), fe)
    elapsed = time.perf_counter() - t0
    if verbose:
        print(f"[runner] {n} frames in {elapsed:.2f}s "
              f"({n / max(elapsed, 1e-9):.2f} scans/s)")
    return fe
