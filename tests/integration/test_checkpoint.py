"""Checkpoint/resume: a run interrupted at frame k and resumed must
produce the EXACT trajectory of an uninterrupted run (SURVEY.md §5 —
a capability the reference lacks entirely)."""

import numpy as np

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.io.simulate import simulate_sequence
from ndt_slam_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint
from ndt_slam_tpu.pipeline.frontend import FrontEnd


def _cfg(**kw):
    base = dict(
        grid_cells_x=128, grid_cells_y=128,
        max_scan_points=1024,
        max_submap_points=16384,
        max_local_map_points=32768,
        submap_sep_thre=4.0,  # force a submap boundary inside the run
        end_frame=10_000,
    )
    base.update(kw)
    return SlamConfig.small(**base)


def test_exact_resume(tmp_path):
    frames = simulate_sequence(n_frames=36, beams=361, seed=11)
    cfg = _cfg()

    # uninterrupted run
    fe_full = FrontEnd(cfg)
    for f in frames:
        fe_full.process(f.scan_xy, f.odo_pose, sid=f.sid)

    # interrupted at 18, checkpointed, resumed
    fe_a = FrontEnd(cfg)
    for f in frames[:18]:
        fe_a.process(f.scan_xy, f.odo_pose, sid=f.sid)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(fe_a, ckpt)
    fe_b = load_checkpoint(ckpt)
    assert fe_b.cnt == 18
    for f in frames[18:]:
        fe_b.process(f.scan_xy, f.odo_pose, sid=f.sid)

    full = np.stack(fe_full.pose_history)
    resumed = np.stack(fe_b.pose_history)
    np.testing.assert_array_equal(full, resumed)
    # map state equivalent: same submap count, same global map size
    assert len(fe_full.pcmap.submaps) == len(fe_b.pcmap.submaps)
    g1, g2 = fe_full.pcmap.global_map(), fe_b.pcmap.global_map()
    assert g1.shape == g2.shape
    np.testing.assert_allclose(g1, g2, atol=1e-6)


def test_manifest_config_evolution(tmp_path):
    """A checkpoint whose manifest carries keys that are no longer
    SlamConfig fields (removed since) and lacks fields added since must
    still load: removed keys are dropped, new fields take their
    defaults, and strict comparison covers only keys present in both
    (ADVICE r4: old checkpoints hard-failed on either side)."""
    import json
    import numpy as np_

    frames = simulate_sequence(n_frames=8, beams=181, seed=3)
    cfg = _cfg()
    fe = FrontEnd(cfg)
    for f in frames:
        fe.process(f.scan_xy, f.odo_pose, sid=f.sid)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(fe, ckpt)

    # rewrite the manifest as an "older build" would have written it:
    # inject a removed key, drop a (pretend-new) key
    data = dict(np_.load(ckpt, allow_pickle=False))
    meta = json.loads(str(data.pop("manifest")))
    meta["cfg"]["max_submap_scans"] = 64          # removed field
    meta["cfg"].pop("pipeline_depth", None)       # "new" field absent
    np_.savez_compressed(ckpt, manifest=json.dumps(meta), **data)

    # loads with cfg=None: removed key dropped, new key defaulted
    fe2 = load_checkpoint(ckpt)
    assert fe2.cnt == 8
    assert fe2.cfg.pipeline_depth == SlamConfig().pipeline_depth

    # loads with an explicit cfg under strict: the absent new key is
    # not a mismatch; a REAL mismatch on a shared key still raises
    fe3 = load_checkpoint(ckpt, cfg=cfg, strict=True)
    assert fe3.cnt == 8
    import pytest
    with pytest.raises(ValueError, match="config mismatch"):
        load_checkpoint(ckpt, cfg=cfg.replace(submap_sep_thre=9.0),
                        strict=True)


def test_resume_with_loop_backend(tmp_path):
    frames = simulate_sequence(n_frames=24, beams=361, seed=5)
    cfg = _cfg(loop_enable=True, loop_keyframe_skip=4, loop_check_skip=6)
    fe = FrontEnd(cfg)
    for f in frames[:12]:
        fe.process(f.scan_xy, f.odo_pose, sid=f.sid)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(fe, ckpt)
    fe2 = load_checkpoint(ckpt)
    assert fe2.backend is not None
    assert fe2.backend.node_sids == fe.backend.node_sids
    assert len(fe2.backend.odom_edges) == len(fe.backend.odom_edges)
    assert len(fe2.backend.loop_edges) == len(fe.backend.loop_edges)
    assert len(fe2.backend.keyframes) == len(fe.backend.keyframes)
    for f in frames[12:]:
        fe2.process(f.scan_xy, f.odo_pose, sid=f.sid)
    assert len(fe2.pose_history) == 24
