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
        for fe in self.frontends:
            fe._defer_map = True  # map updates batched per tick (below)
        self._map_step_cache = {}
        self._stack = None  # persistent [B,...] map state (see below)
        self._tick_global = None  # (global_xy, mask_dev, mask_np) of the tick
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
        # placeholder that makes _frame_inputs skip assembling a
        # per-FE registration target on the all-stacked fast path
        self._dummy_local = PointBuffer(self._dummy[6], self._dummy[7])

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

        from ndt_slam_tpu.io.native import resample_points
        from ndt_slam_tpu.core.points import PAD_COORD

        cfg = self.cfg
        S = cfg.max_scan_points
        # HOST-side input assembly: every per-slot device op (a put, a
        # slice, a stack element) costs ~1 ms of tunnel enqueue, so the
        # tick builds numpy [B, ...] blocks and ships each with ONE
        # put. Small carries (prev odo, last pose, last cov) are host
        # values in batch mode (_finish_frame keeps them as numpy).
        scan_np = np.full((B, S, 2), np.float32(PAD_COORD), np.float32)
        mask_np = np.zeros((B, S), bool)
        odo_np = np.zeros((B, 3), np.float32)
        prev_np = np.zeros((B, 3), np.float32)
        last_np = np.zeros((B, 3), np.float32)
        cov_np = np.tile(np.eye(3, dtype=np.float32)[None] * 1e-4,
                         (B, 1, 1))

        compute = []  # (i, sid, rs, odo)
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
            rs = resample_points(
                scans_xy_local[i], cfg.resample_space,
                cfg.resample_space_thre,
            )
            k = min(len(rs), S)
            scan_np[i, :k] = rs[:k]
            mask_np[i, :k] = True
            odo = np.asarray(odo_poses_deg[i], np.float32)
            odo_np[i] = odo
            prev_np[i] = fe.prev_odo
            last_np[i] = fe.pcmap.get_last_pose()
            cov_np[i] = np.asarray(fe.last_cov)
            compute.append((i, sid, rs, odo))

        if not compute:
            self._flush_map_updates()  # bootstrap frames defer too
            return recs

        scan_xy_b = jnp.asarray(scan_np)
        scan_mask_b = jnp.asarray(mask_np)

        # Registration targets: the fast path reads the persistent
        # [B, L] stacked target DIRECTLY (zero copies). Slots not
        # stack-resident (bootstrap aftermath, submap close,
        # corrections) fall back to per-slot assembly.
        st = self._stack
        all_stacked = st is not None and all(
            st["valid"][i] for (i, *_rest) in compute
        )
        if all_stacked:
            local_xy_b = st["target"].xy
            local_mask_b = st["target"].mask
        else:
            rows = [
                (self._dummy_local
                 if not any(c[0] == i for c in compute)
                 else (self.stacked_target(i)
                       or fes[i].pcmap.registration_target()))
                for i in range(B)
            ]
            local_xy_b = jnp.stack([r.xy for r in rows])
            local_mask_b = jnp.stack([r.mask for r in rows])

        out = self._step(
            scan_xy_b, scan_mask_b, jnp.asarray(odo_np),
            jnp.asarray(prev_np), jnp.asarray(last_np),
            jnp.asarray(cov_np), local_xy_b, local_mask_b,
        )
        # ONE transfer for the whole batch's small outputs — the [B,24]
        # packed rows the step emits (fetching 9 separate arrays costs
        # 9x the tunnel marshaling).
        from ndt_slam_tpu.pipeline.async_frontend import _unpack_row
        rows = np.asarray(jax.device_get(out.packed))
        # the tick's map-frame scans, consumed wholesale by the flush
        self._tick_global = (out.global_xy, scan_mask_b, mask_np)
        for (i, sid, rs, odo) in compute:
            host_i = _unpack_row(rows[i])
            scan_host = PointBuffer(scan_np[i], mask_np[i])
            recs[i] = fes[i]._finish_frame(
                None, host_i, scan_host, rs, odo, None, sid,
                pending=("slot", i),
            )
        self._flush_map_updates()
        return recs

    # ---- persistently stacked map state --------------------------------
    #
    # The per-sequence map buffers (current-submap proc cloud, raw scan
    # tail, previous submap's closed cloud, registration target) live
    # as [B, ...] arrays on device between ticks, so the steady-state
    # tick costs ONE vmapped map-update dispatch for the whole batch —
    # restacking them from the per-FE maps each tick costs dozens of
    # device ops (measured: it made batch-8 SLOWER than sequential on
    # the remote-TPU tunnel). Per-slot fallbacks (bootstrap, submap
    # close, loop-closure rewrite, flag mismatch) dump the slot back to
    # its FrontEnd's canonical PointCloudMap, take the normal per-FE
    # path, and reload.

    def _make_batched_map_step(self, flags):
        from ndt_slam_tpu.mapping.pointcloud_map import (
            _add_scan_and_target,
        )

        def one(proc, count, raw_a, raw_b, scan, prev, active):
            p2, c2, tgt = _add_scan_and_target.__wrapped__(
                proc, count, raw_a, raw_b, scan, prev, **flags
            )
            w = lambda n, o: jnp.where(active, n, o)
            proc_o = PointBuffer(w(p2.xy, proc.xy), w(p2.mask, proc.mask))
            # raw tail roll: (raw_a, raw_b) <- (raw_b, scan)
            raw_a_o = PointBuffer(w(raw_b.xy, raw_a.xy),
                                  w(raw_b.mask, raw_a.mask))
            raw_b_o = PointBuffer(w(scan.xy, raw_b.xy),
                                  w(scan.mask, raw_b.mask))
            return proc_o, w(c2, count), raw_a_o, raw_b_o, tgt

        return jax.jit(jax.vmap(one))

    def _stack_init(self, key, flags):
        """Fresh (empty/invalid) stacked state for a flag set."""
        cfg = self.cfg
        B = len(self.frontends)
        S, C = cfg.max_scan_points, cfg.max_submap_points
        P = C if flags["has_prev"] else 1
        L = cfg.max_local_map_points
        from ndt_slam_tpu.core.points import PAD_COORD
        # masked points sit at PAD_COORD (repo-wide invariant): the
        # old -3.4e38 fill overflowed to inf when squared in f32
        empty = lambda n: PointBuffer(
            jnp.full((B, n, 2), PAD_COORD, jnp.float32),
            jnp.zeros((B, n), bool),
        )
        self._stack = {
            "key": key, "flags": flags,
            "proc": empty(C), "count": jnp.zeros((B,), jnp.int32),
            "raw_a": empty(S), "raw_b": empty(S), "prev": empty(P),
            "target": empty(L),
            "valid": np.zeros(B, bool),
        }

    def _load_slot(self, i):
        """Per-FE map state -> stacked slot i (on flag transitions)."""
        st = self._stack
        fe = self.frontends[i]
        cur = fe.pcmap.submaps[-1]
        S = self.cfg.max_scan_points

        def setb(name, buf):
            st[name] = PointBuffer(
                st[name].xy.at[i].set(buf.xy),
                st[name].mask.at[i].set(buf.mask),
            )

        setb("proc", cur.proc)
        st["count"] = st["count"].at[i].set(cur.proc_count)
        raw = cur.raw
        setb("raw_b", raw[-1] if raw else PointBuffer.empty(S))
        setb("raw_a", raw[-2] if len(raw) >= 2 else PointBuffer.empty(S))
        if st["flags"]["has_prev"]:
            setb("prev", fe.pcmap.submaps[-2].final_cloud)
        st["valid"][i] = True

    def _dump_slot(self, i):
        """Stacked slot i -> per-FE map state (before per-FE paths)."""
        st = self._stack
        if st is None or not st["valid"][i]:
            return
        fe = self.frontends[i]
        cur = fe.pcmap.submaps[-1]
        sl = lambda b: PointBuffer(b.xy[i], b.mask[i])
        cur.proc = sl(st["proc"])
        cur.proc_count = st["count"][i]
        cur.raw = (
            [sl(st["raw_a"]), sl(st["raw_b"])] if cur.n_scans >= 2
            else ([sl(st["raw_b"])] if cur.n_scans >= 1 else [])
        )
        fe.pcmap._cached_target = sl(st["target"])
        # last_scan is checkpoint state (reference setLastScan parity);
        # in defer mode _grow_map skipped it (sentinel), so restore the
        # newest map-frame scan from the stacked raw tail here.
        if cur.n_scans >= 1:
            fe.pcmap.set_last_scan(sl(st["raw_b"]))
        st["valid"][i] = False

    def stacked_target(self, i):
        """Slot i's registration target if it is stack-resident."""
        st = self._stack
        if st is not None and st["valid"][i]:
            return PointBuffer(st["target"].xy[i], st["target"].mask[i])
        return None

    def finalize(self):
        """Dump every stack-resident slot back to its FrontEnd (end of
        run: canonical maps needed for outputs/checkpoints) and flush
        deferred loop corrections."""
        for i in range(len(self.frontends)):
            self._dump_slot(i)
        for fe in self.frontends:
            fe.finalize()

    def _flush_map_updates(self):
        """Execute the tick's deferred map updates: steady slots (flag
        set matching the stack, no submap close) go through ONE vmapped
        program on the persistent stacked state; everything else dumps
        to its per-FE map and takes the normal fused per-FE path."""
        fes = self.frontends
        B = len(fes)
        tick = getattr(self, "_tick_global", None)
        self._tick_global = None
        gxy = gmask_dev = gmask_np = None
        if tick is not None:
            gxy, gmask_dev, gmask_np = tick

        def materialize(ps):
            """Sentinel pending -> per-slot map-frame PointBuffer (a
            device slice — only paid on the rare fallback paths)."""
            if isinstance(ps, tuple) and ps[0] == "slot":
                i = ps[1]
                return PointBuffer(gxy[i], jnp.asarray(gmask_np[i]))
            return ps

        pending = []
        for i, fe in enumerate(fes):
            if fe._map_rewritten:
                # a loop-closure correction rebuilt the per-FE map in
                # place: it is canonical now, the stack copy is stale
                fe._map_rewritten = False
                if self._stack is not None:
                    self._stack["valid"][i] = False
            ps = fe._pending_scan
            if ps is None:
                continue
            fe._pending_scan = None
            flags = fe.pcmap.fused_add_flags()
            key = None if flags is None else tuple(sorted(flags.items()))
            pending.append((i, ps, flags, key))
        if not pending:
            return

        # steady key = the most common flag set among this tick's slots
        keys = [k for (_i, _p, _f, k) in pending if k is not None]
        steady = max(set(keys), key=keys.count) if keys else None
        if steady is not None and (
                self._stack is None or self._stack["key"] != steady):
            # flag-set transition: drain the old stack, start the new
            if self._stack is not None:
                for i in range(B):
                    self._dump_slot(i)
            flags = dict(steady)
            self._stack_init(steady, flags)
            self._map_step_cache.setdefault(
                steady, self._make_batched_map_step(flags)
            )

        st = self._stack
        active = np.zeros(B, bool)
        overrides = []  # (i, PointBuffer): non-sentinel rows to scatter
        for (i, ps, flags, key) in pending:
            if key is not None and st is not None and key == st["key"]:
                if not st["valid"][i]:
                    self._load_slot(i)
                if not (isinstance(ps, tuple) and ps[0] == "slot"):
                    overrides.append((i, ps))
                active[i] = True
            else:
                # submap close / flag mismatch: per-FE path
                self._dump_slot(i)
                fes[i].pcmap.add_points(materialize(ps),
                                        make_target=True)
        if not active.any():
            return

        # the tick's map-frame scans enter WHOLESALE (rows of inactive
        # slots are garbage the `active` mask discards); non-sentinel
        # pendings (bootstrap ticks) are scattered into their rows
        if gxy is not None:
            scan_xy, scan_mask = gxy, gmask_dev
            for (i, pb) in overrides:
                scan_xy = scan_xy.at[i].set(pb.xy)
                scan_mask = scan_mask.at[i].set(pb.mask)
        else:
            # no register batch ran this tick (pure-bootstrap tick)
            ov = dict(overrides)
            base = PointBuffer.empty(self.cfg.max_scan_points)
            scan_xy = jnp.stack([
                (ov[i].xy if i in ov else base.xy) for i in range(B)
            ])
            scan_mask = jnp.stack([
                (ov[i].mask if i in ov else base.mask) for i in range(B)
            ])
        fn = self._map_step_cache[st["key"]]
        proc, count, raw_a, raw_b, target = fn(
            st["proc"], st["count"], st["raw_a"], st["raw_b"],
            PointBuffer(scan_xy, scan_mask), st["prev"],
            jnp.asarray(active),
        )
        st.update(proc=proc, count=count, raw_a=raw_a, raw_b=raw_b,
                  target=target)
        # host counters advance for stack-resident slots (the device
        # side already rolled raw/proc); cached_target now lives in
        # the stack, read back via stacked_target()
        for (i, ps, flags, key) in pending:
            if active[i]:
                cur = fes[i].pcmap.submaps[-1]
                cur.n_scans += 1
                fes[i].pcmap._cached_target = None


def _result_spec_template():
    """A FrameResult-shaped pytree for out_specs construction."""
    from ndt_slam_tpu.pipeline.frontend import FrameResult

    z = 0
    return FrameResult(*([z] * len(FrameResult._fields)))


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
    bfe.finalize()  # canonical per-FE maps for outputs/eval
    return bfe.frontends
