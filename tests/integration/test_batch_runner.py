"""Lockstep multi-sequence runner: batched execution must reproduce
the sequential FrontEnd per sequence (same code path split at
_frame_inputs/_finish_frame, one vmapped device program)."""

import numpy as np

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.io.simulate import simulate_sequence
from ndt_slam_tpu.pipeline.batch_runner import run_slam_batch
from ndt_slam_tpu.pipeline.frontend import FrontEnd


def _cfg(**kw):
    # Tight convergence: at the reference trans_eps (0.01) the Newton
    # loop stops once the step is < 1 cm, so the pose is determined
    # only to ~1e-3 and vmap's f32 reduction-order noise can shift the
    # stopping iteration (same effect as in the sharding tests,
    # tests/distributed/test_sharded_register.py). Comparing
    # tightly-converged optima makes batch-vs-sequential equality
    # well-defined.
    base = dict(end_frame=10_000, ndt_trans_eps=1e-4,
                ndt_max_iterations=80)
    base.update(kw)
    return SlamConfig.small(**base)


def test_batch_matches_sequential():
    cfg = _cfg()
    seqs = [
        simulate_sequence(n_frames=14, beams=181, seed=3),
        simulate_sequence(n_frames=14, beams=181, seed=11),
    ]

    # sequential references
    seq_fes = []
    for frames in seqs:
        fe = FrontEnd(cfg)
        for fr in frames:
            fe.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
        seq_fes.append(fe)

    batch_fes = run_slam_batch(seqs, cfg)

    for fe_seq, fe_bat in zip(seq_fes, batch_fes):
        a = np.stack(fe_seq.pose_history)
        b = np.stack(fe_bat.pose_history)
        # vmap reorders f32 reductions, and mm-scale per-frame noise
        # compounds through the map feedback; measured ceiling is
        # ~6e-3 (m / deg) over 14 frames. 0.02 still catches any real
        # defect (wrong carry, swapped sequence: meters apart).
        np.testing.assert_allclose(a, b, atol=0.02)
        # accept/reject decisions must agree exactly
        assert [m.get("successful") for m in fe_seq.metrics] == \
            [m.get("successful") for m in fe_bat.metrics]
        assert len(fe_seq.pcmap.submaps) == len(fe_bat.pcmap.submaps)
        # the map clouds pass through voxel/occupancy discretization,
        # so mm-scale pose noise can flip individual cell membership;
        # compare as point sets: counts within 3%, and every batch
        # point near some sequential point
        ga, gb = fe_seq.pcmap.global_map(), fe_bat.pcmap.global_map()
        assert abs(len(ga) - len(gb)) <= 0.03 * max(len(ga), 1)
        sub = gb[:: max(1, len(gb) // 400)]
        d = np.sqrt(
            ((sub[:, None, :] - ga[None, :, :]) ** 2).sum(-1)
        ).min(1)
        assert np.median(d) < 0.02, np.median(d)


def test_batch_uneven_lengths():
    cfg = _cfg()
    seqs = [
        simulate_sequence(n_frames=12, beams=181, seed=3),
        simulate_sequence(n_frames=7, beams=181, seed=5),
    ]
    fes = run_slam_batch(seqs, cfg)
    assert len(fes[0].pose_history) == 12
    assert len(fes[1].pose_history) == 7
    for fe in fes:
        assert np.all(np.isfinite(np.stack(fe.pose_history)))


def test_batch_matches_sequential_across_submap_closes():
    """The persistent-stacked map path must stay exact across submap
    closes (the per-slot fallback: dump slot -> per-FE close path ->
    reload): tiny submap_sep_thre forces several closes per sequence.
    Trajectories and final maps must match the sequential runner."""
    import numpy as np
    from ndt_slam_tpu.config import SlamConfig
    from ndt_slam_tpu.io.simulate import simulate_sequence
    from ndt_slam_tpu.pipeline.batch_runner import run_slam_batch
    from ndt_slam_tpu.pipeline.frontend import FrontEnd

    cfg = SlamConfig.small(end_frame=10_000, submap_sep_thre=1.0)
    seqs = [
        simulate_sequence(n_frames=14, beams=181, seed=3),
        simulate_sequence(n_frames=14, beams=181, seed=9),
    ]
    fes_b = run_slam_batch(seqs, cfg)
    for s, fb in zip(seqs, fes_b):
        fe = FrontEnd(cfg)
        for fr in s:
            fe.process(fr.scan_xy, fr.odo_pose, sid=fr.sid)
        assert len(fe.pcmap.submaps) >= 3  # closes really happened
        assert len(fb.pcmap.submaps) == len(fe.pcmap.submaps)
        a = np.stack(fb.pose_history)
        b = np.stack(fe.pose_history)
        # positions [m] and headings [deg] at their own scales; the
        # threshold-rich close path amplifies vmap-reduction f32 chaos
        np.testing.assert_allclose(a[:, :2], b[:, :2], atol=0.05)
        d = np.abs((a[:, 2] - b[:, 2] + 180.0) % 360.0 - 180.0)
        assert d.max() <= 0.3, d.max()
        # f32 pose chaos (bounded above) cascades into the
        # threshold-based interior pass, so clouds match structurally,
        # not point-for-point: identical submap partition, per-submap
        # counts within 5% (a dropped/duplicated SCAN would shift a
        # count by ~50%)
        for sa, sb in zip(fb.pcmap.submaps, fe.pcmap.submaps):
            ca = int(np.asarray(sa.cloud().count()))
            cb = int(np.asarray(sb.cloud().count()))
            assert abs(ca - cb) <= 0.05 * max(ca, cb) + 2, (ca, cb)
