"""PipelinedFrontEnd parity: the chunked-host-sync sequential pipeline
(VERDICT r3 next-round #1) must reproduce the synchronous FrontEnd's
trajectory EXACTLY — speculative frames see bit-identical inputs, and
invalidated frames (submap closes, loop-closure corrections) are
replayed through the synchronous path."""

import numpy as np

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.io.simulate import simulate_sequence
from ndt_slam_tpu.pipeline.async_frontend import PipelinedFrontEnd
from ndt_slam_tpu.pipeline.frontend import FrontEnd


def _run_sync(cfg, frames):
    fe = FrontEnd(cfg)
    for fr in frames:
        fe.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
    fe.finalize()
    return fe


def _run_pipelined(cfg, frames, depth):
    fe = PipelinedFrontEnd(cfg, depth=depth)
    recs = []
    for fr in frames:
        recs.extend(fe.process(fr.scan_xy, fr.odo_pose, sid=fr.sid))
    recs.extend(fe.drain())
    fe.finalize()
    return fe, recs


def _assert_parity(fe_sync, fe_pipe, recs):
    a = np.stack(fe_sync.pose_history)
    b = np.stack(fe_pipe.pose_history)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(
        np.stack(fe_sync.cov_history), np.stack(fe_pipe.cov_history)
    )
    assert [m.get("successful") for m in fe_sync.metrics] == \
        [m.get("successful") for m in fe_pipe.metrics]
    assert len(fe_sync.pcmap.submaps) == len(fe_pipe.pcmap.submaps)
    # every frame produced exactly one resolved record, in order
    assert [r["sid"] for r in recs if not r.get("skipped")] == \
        [m["sid"] for m in fe_sync.metrics]
    ga, gb = fe_sync.pcmap.global_map(), fe_pipe.pcmap.global_map()
    np.testing.assert_array_equal(ga, gb)


def test_pipelined_matches_sync_plain():
    # sep_thre larger than the whole trajectory: pure speculation, no
    # rollback ever fires
    cfg = SlamConfig.small(end_frame=10_000, submap_sep_thre=1000.0,
                           pipeline_depth=0)
    frames = simulate_sequence(n_frames=18, beams=181, seed=3)
    fe_sync = _run_sync(cfg, frames)
    fe_pipe, recs = _run_pipelined(cfg, frames, depth=4)
    assert fe_pipe.n_rollbacks == 0
    _assert_parity(fe_sync, fe_pipe, recs)


def test_pipelined_matches_sync_across_submap_closes():
    """Tiny sep_thre forces several submap closes — each one lands
    mid-chunk, exercising rollback + close-path redo + tail replay."""
    cfg = SlamConfig.small(
        end_frame=10_000, submap_sep_thre=1.0, pipeline_depth=0
    )
    frames = simulate_sequence(n_frames=20, beams=181, seed=3)
    fe_sync = _run_sync(cfg, frames)
    fe_pipe, recs = _run_pipelined(cfg, frames, depth=4)
    assert len(fe_sync.pcmap.submaps) >= 3
    assert fe_pipe.n_rollbacks >= 2  # the closes really were speculated
    _assert_parity(fe_sync, fe_pipe, recs)


def test_pipelined_matches_sync_with_loop_closure():
    """Loop-closure corrections rewrite the map mid-chunk: the
    correction must apply at the same frame as in the sync path and
    invalidated in-flight frames must be replayed."""
    def _circle(n, radius=4.0):
        s = np.linspace(0, 2 * np.pi, n)
        x = radius * np.sin(s)
        y = radius * (1 - np.cos(s))
        th = np.degrees(np.arctan2(np.gradient(y), np.gradient(x)))
        return np.stack([x, y, th], axis=1)

    cfg = SlamConfig.small(
        end_frame=10_000,
        grid_cells_x=128, grid_cells_y=128,
        max_scan_points=1024,
        max_submap_points=16384,
        max_local_map_points=32768,
        loop_enable=True,
        loop_min_frame_gap=30,
        loop_radius=3.0,
        loop_keyframe_skip=3,
        loop_check_skip=3,
        pgo_iterations=10,
        pipeline_depth=0,
    )
    frames = simulate_sequence(
        n_frames=80, beams=361, seed=7, trajectory=_circle(80),
        odo_noise_v=0.10, odo_noise_w=2.5,
    )
    fe_sync = _run_sync(cfg, frames)
    fe_pipe, recs = _run_pipelined(cfg, frames, depth=4)
    assert fe_sync.n_corrections >= 1
    assert fe_pipe.n_corrections == fe_sync.n_corrections
    assert fe_pipe.n_replayed >= 1  # a correction invalidated the tail
    _assert_parity(fe_sync, fe_pipe, recs)


def test_pipelined_checkpoint_drains():
    import os
    import tempfile

    from ndt_slam_tpu.pipeline.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    cfg = SlamConfig.small(end_frame=10_000, pipeline_depth=0)
    frames = simulate_sequence(n_frames=10, beams=181, seed=5)
    fe = PipelinedFrontEnd(cfg, depth=8)
    for fr in frames:
        fe.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
    assert fe._queue  # frames genuinely in flight
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_checkpoint(fe, path)  # must drain, not crash
        assert not fe._queue
        assert len(fe.pose_history) == 10
        fe2 = load_checkpoint(path, cfg)
        np.testing.assert_allclose(
            np.stack(fe2.pose_history), np.stack(fe.pose_history)
        )
