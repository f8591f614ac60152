"""Pose-graph SLAM backend: nodes, edges, loop detection, optimization.

The reference's BackEnd/PoseGraph/LoopDetector are disabled scaffolding
(reference: src/FrontEnd.cpp:21-44, CMakeLists.txt:74-87); this module
makes them first-class. Every processed frame becomes a graph node
(2 Hz scan rate — graphs stay small, SURVEY.md §7.3 item 6), odometry
edges chain consecutive fused poses, and accepted loop closures add
long-range edges. After each accepted loop the whole trajectory is
re-optimized (graph/pose_graph.py) and the caller rewrites its pose
history + map (PointCloudMap.remake_maps — the reference's
commented-out remakeMaps semantics, src/PointCloudMap.cpp:136-171).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ndt_slam_tpu.config import SlamConfig

from ndt_slam_tpu.core.points import PointBuffer
from ndt_slam_tpu.graph.keyframes import KeyframeStore
from ndt_slam_tpu.graph.loop_closure import verify_candidates
from ndt_slam_tpu.graph.pose_graph import (
    PoseGraph, optimize, optimize_hierarchical,
)

_DEG = np.float32(np.pi / 180.0)


def _pose_deg_to_rad(p):
    return np.array([p[0], p[1], np.deg2rad(p[2])], np.float32)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _cal_motion_np(cur_deg: np.ndarray, prev_deg: np.ndarray) -> np.ndarray:
    """Host-side cur (-) prev in prev's robot frame (same math as
    pose2.cal_motion / reference src/Pose2D.cpp:5-14). The backend runs
    this EVERY frame; the jnp version would cost a device dispatch +
    fetch round trip per call — ~50 ms over a remote-TPU tunnel."""
    from ndt_slam_tpu.core.angles import sub_deg

    dx = float(cur_deg[0]) - float(prev_deg[0])
    dy = float(cur_deg[1]) - float(prev_deg[1])
    th = np.radians(float(prev_deg[2]))
    c, s = np.cos(th), np.sin(th)
    return np.array(
        [c * dx + s * dy, -s * dx + c * dy,
         sub_deg(float(cur_deg[2]), float(prev_deg[2]))],
        np.float32,
    )


def _pos_var(cov_deg: np.ndarray) -> float:
    """Largest eigenvalue of the 2x2 position block of a pose
    covariance (closed form) — the drift scale for candidate search."""
    a, b, c = float(cov_deg[0, 0]), float(cov_deg[0, 1]), float(cov_deg[1, 1])
    h = 0.5 * (a + c)
    return max(0.0, h + np.sqrt(max(0.0, (0.5 * (a - c)) ** 2 + b * b)))


class GraphBackend:
    """Host-side bookkeeping + device-side verification/optimization.

    With `mesh` set, candidate verification fans out over the mesh's
    "dp" axis (graph/loop_closure.make_sharded_verify) — the multi-chip
    loop-closure path; otherwise the single-device batched verifier
    runs. Both share _verify_one exactly.
    """

    def __init__(self, cfg: SlamConfig, mesh=None):
        self.cfg = cfg
        self.keyframes = KeyframeStore(cfg)
        self.node_poses_rad: List[np.ndarray] = []   # per frame
        self.node_sids: List[int] = []
        # Odometry chain: edge k connects nodes (k, k+1); kept separate
        # from loop edges so the hierarchical solver can condense the
        # chain (graph/pose_graph.optimize_hierarchical).
        self.odom_edges: List[tuple] = []             # (z_rad[3], omega[3,3])
        self.loop_edges: List[tuple] = []             # (i, j, z_rad[3], omega[3,3])
        self.loops_accepted = 0
        # per-accepted-edge observability record (sids, measurement,
        # verify gates, information spectrum) for offline analysis
        self.edge_log: List[dict] = []
        # deferred-optimization state (cfg.loop_opt_min_frames): edges
        # accepted since the last optimize+remake, and the node index
        # at which that last correction ran.
        self._pending_edges = 0
        self._last_opt_node = -(10 ** 9)
        # accumulated per-frame position variance (chain model),
        # feeding the drift-aware candidate radius; see add_frame
        self._cum_pos_var = 0.0
        self.mesh = mesh
        self._verify_sharded = None
        self._batch_capacity = cfg.loop_max_candidates
        if mesh is not None:
            from ndt_slam_tpu.graph.loop_closure import make_sharded_verify
            dp = mesh.shape["dp"]
            # round the candidate batch up to the dp axis size
            self._batch_capacity = -(-cfg.loop_max_candidates // dp) * dp
            self._verify_sharded = make_sharded_verify(mesh, cfg)
        # Async verification (cfg.loop_verify_async): a dispatched
        # candidate batch is resolved at the NEXT backend check, so its
        # device compute and result fetch overlap with the frames in
        # between instead of blocking the frame path. In flight:
        # (sid, cand list, packed device results).
        self._inflight = None
        self._dummy_scan = None  # masked filler rows for short batches
        # sharded-verify host copies of keyframe scans, keyed by sid
        self._host_scan_cache: dict = {}
        # prefetched in-flight verify rows: (packed_ref, rows_np), fed
        # by the pipelined frontend when it folds the verify fetch into
        # its chunk fetch (ONE combined device_get instead of a
        # separate RTT at the next backend check — VERDICT r4 #1)
        self._prefetched: Optional[tuple] = None
        # wall-time split of the backend bill (BASELINE.md accounting):
        # t_verify = candidate verification (dispatch+fetch),
        # t_optimize = pose-graph solves.
        self.t_verify = 0.0
        self.t_optimize = 0.0

    # ---- graph growth --------------------------------------------------
    def add_frame(
        self, sid: int, fused_pose_deg: np.ndarray,
        cov_deg: np.ndarray, scan_local: PointBuffer,
    ) -> int:
        """Register a processed frame as a node; chain an odometry edge
        from the previous node. cov_deg: fused covariance (deg units for
        theta, reference convention SURVEY.md §6.3 item 1)."""
        pose_rad = _pose_deg_to_rad(np.asarray(fused_pose_deg, np.float32))
        node = len(self.node_poses_rad)
        self.node_poses_rad.append(pose_rad)
        self.node_sids.append(int(sid))
        # Chain-model drift accumulator: the EKF's absolute covariance
        # saturates once scan matching succeeds (the capped Q dominates
        # the prior), so it cannot measure drift since an OLD keyframe.
        # The per-frame fused covariance ~ the per-step relative
        # uncertainty, and independent steps sum — cum_now - cum_k is
        # the variance of the current pose relative to keyframe k.
        self._cum_pos_var += _pos_var(np.asarray(cov_deg))

        if node > 0:
            prev_deg = self._pose_rad_to_deg(self.node_poses_rad[node - 1])
            z_deg = _cal_motion_np(
                np.asarray(fused_pose_deg, np.float32), prev_deg
            )
            z_rad = _pose_deg_to_rad(z_deg)
            omega = self._odom_information(np.asarray(cov_deg))
            self.odom_edges.append((z_rad, omega))

        if node % max(1, self.cfg.loop_keyframe_skip) == 0:
            self.keyframes.add(sid, fused_pose_deg, scan_local,
                               pos_var=self._cum_pos_var)
        return node

    @staticmethod
    def _pose_rad_to_deg(p):
        return np.array([p[0], p[1], np.rad2deg(p[2])], np.float32)

    def _odom_information(self, cov_deg: np.ndarray) -> np.ndarray:
        """3x3 information for an odometry edge, radians; floor the
        covariance so near-zero EKF covariances don't over-pin edges."""
        J = np.diag([1.0, 1.0, float(_DEG)])
        cov_rad = J @ np.asarray(cov_deg, np.float64) @ J.T
        cov_rad += np.diag([1e-4, 1e-4, (0.2 * _DEG) ** 2])
        return np.linalg.inv(cov_rad).astype(np.float32)

    # ---- loop closure --------------------------------------------------
    def try_close(
        self, sid: int, fused_pose_deg: np.ndarray,
        scan_local: PointBuffer,
    ) -> Optional[np.ndarray]:
        """Detect + verify + (possibly deferred) optimize. Returns
        corrected per-frame poses [n_frames, 3] (degrees) when a
        correction ran, else None. With cfg.loop_opt_min_frames > 0,
        accepted edges accumulate and the optimize+remake runs at most
        once per that many frames — a burst of loops at a revisit costs
        one correction instead of one per accepted edge."""
        import time as _time

        cfg = self.cfg
        # resolve the previous check's in-flight verification first:
        # its device compute has been overlapping with the frames since
        t0 = _time.perf_counter()
        self._resolve_verify()
        cand = self.keyframes.candidates(
            np.asarray(fused_pose_deg), sid,
            max_candidates=cfg.loop_max_candidates,
            cur_pos_var=self._cum_pos_var,
        )
        if cand:
            self._dispatch_verify(sid, fused_pose_deg, scan_local, cand)
            if not cfg.resolved_loop_verify_async:
                self._resolve_verify()
        self.t_verify += _time.perf_counter() - t0
        if self._pending_edges == 0:
            return None
        node_now = len(self.node_poses_rad) - 1
        if node_now - self._last_opt_node < cfg.loop_opt_min_frames:
            return None
        self._last_opt_node = node_now
        self._pending_edges = 0
        t1 = _time.perf_counter()
        out = self.optimize_all()
        self.t_optimize += _time.perf_counter() - t1
        return out

    def _evict_stale_scan_cache(self) -> None:
        """Drop sharded-verify host copies of keyframes no longer in
        the store (decimation) — unbounded growth otherwise, tens of
        KB per keyframe ever stored on long runs."""
        live = set(self.keyframes.sids)
        if len(self._host_scan_cache) > len(live):
            for s_k in list(self._host_scan_cache):
                if s_k not in live:
                    del self._host_scan_cache[s_k]

    def correction_due(self, node_idx: int) -> bool:
        """Would a frame landing at graph node `node_idx` trigger a
        deferred correction at its backend check? THE interface for
        schedulers predicting corrections ahead of resolution (the
        pipelined frontend's early-flush heuristic) — it must agree
        with try_close's own deferral condition, and a unit test pins
        the two together (tests/unit/test_backend.py). Edges still in
        async-verify flight are not counted: that rare case takes the
        normal rollback path."""
        if self._pending_edges <= 0:
            return False
        if node_idx % max(1, self.cfg.loop_check_skip) != 0:
            return False
        return node_idx - self._last_opt_node >= self.cfg.loop_opt_min_frames

    def _dispatch_verify(
        self, sid: int, fused_pose_deg: np.ndarray,
        scan_local: PointBuffer, cand: List[int],
    ) -> None:
        """Dispatch the batched verification of candidate keyframes;
        results are PACKED device-side into one [B,16] array and left
        in flight (fetched by _resolve_verify — synchronously right
        after, or one check cycle later in async mode)."""
        from ndt_slam_tpu.graph.loop_closure import pack_verify_out

        cfg = self.cfg
        B = self._batch_capacity
        S = scan_local.xy.shape[0]
        init = np.zeros((B, 3), np.float32)
        for b, k in enumerate(cand):
            rel_deg = _cal_motion_np(
                np.asarray(fused_pose_deg, np.float32),
                self.keyframes.poses_deg[k],
            )
            init[b] = _pose_deg_to_rad(rel_deg)

        if self._verify_sharded is not None:
            # sharded path: host-assembled candidate batch (uncommitted
            # numpy shards cleanly over the mesh's dp axis). Keyframe
            # scans are device references now, so cache the host copy
            # per SID — one transfer per keyframe ever, not per check.
            self._evict_stale_scan_cache()
            tgt_xy = np.zeros((B, S, 2), np.float32)
            tgt_mask = np.zeros((B, S), bool)
            for b, k in enumerate(cand):
                s_k = self.keyframes.sids[k]
                row = self._host_scan_cache.get(s_k)
                if row is None:
                    row = (np.asarray(self.keyframes.scan_xy[k]),
                           np.asarray(self.keyframes.scan_mask[k]))
                    self._host_scan_cache[s_k] = row
                tgt_xy[b] = row[0][:S]
                tgt_mask[b] = row[1][:S]
            out = self._verify_sharded(
                scan_local.xy, scan_local.mask,
                jnp.asarray(tgt_xy), jnp.asarray(tgt_mask),
                jnp.asarray(init),
            )
        else:
            # single-device path: candidate scans are stored as device
            # references (keyframes.add), so the batch is ONE device-
            # side stack — no host copies or uploads of scan data
            if self._dummy_scan is None or \
                    self._dummy_scan[0].shape[0] != S:
                from ndt_slam_tpu.core.points import PAD_COORD
                self._dummy_scan = (
                    jnp.full((S, 2), PAD_COORD, jnp.float32),
                    jnp.zeros((S,), bool),
                )
            dxy, dmask = self._dummy_scan
            rows_xy = [jnp.asarray(self.keyframes.scan_xy[k])
                       for k in cand]
            rows_m = [jnp.asarray(self.keyframes.scan_mask[k])
                      for k in cand]
            rows_xy += [dxy] * (B - len(cand))
            rows_m += [dmask] * (B - len(cand))
            out = verify_candidates(
                cfg, scan_local.xy, scan_local.mask,
                jnp.stack(rows_xy), jnp.stack(rows_m),
                jnp.asarray(init),
            )
        packed = pack_verify_out(out)
        try:
            # start the D2H now; the blocking fetch happens a check
            # cycle later, by when the transfer is (ideally) done
            packed.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        # capture candidate SIDs, not store indices: in async mode a
        # KeyframeStore._decimate between dispatch and resolve would
        # invalidate the indices (crash, or worse, an edge silently
        # attached to the wrong node)
        cand_sids = [self.keyframes.sids[k] for k in cand]
        self._inflight = (sid, cand_sids, packed)

    def inflight_packed(self):
        """The in-flight async verification's packed device array, or
        None — exposed so the pipelined frontend can fold its fetch
        into the chunk fetch (one combined transfer)."""
        return self._inflight[2] if self._inflight is not None else None

    def feed_prefetched(self, rows: np.ndarray) -> None:
        """Hand the backend the host copy of its in-flight verify
        results (fetched alongside the pipeline chunk); the next
        _resolve_verify consumes it without a device round trip."""
        if self._inflight is not None:
            self._prefetched = (self._inflight[2], np.asarray(rows))

    def _resolve_verify(self) -> None:
        """Resolve an in-flight verification (ONE [B,16] transfer —
        or zero, when the pipelined frontend prefetched the rows) and
        add its accepted edges."""
        if self._inflight is None:
            return
        from ndt_slam_tpu.graph.loop_closure import unpack_verify_row

        import jax

        sid, cand_sids, packed = self._inflight
        self._inflight = None
        pf, self._prefetched = self._prefetched, None
        if pf is not None and pf[0] is packed:
            rows = pf[1]
        else:
            rows = np.asarray(jax.device_get(packed))

        sid_rows = {s: i for i, s in enumerate(self.node_sids)}
        cur_node = sid_rows.get(sid)
        if cur_node is None:
            return
        for b in range(len(cand_sids)):
            (z_rad, cost_b, overlap_b, overlap_tgt_b, accepted_b,
             H) = unpack_verify_row(rows[b])
            if not accepted_b:
                continue
            sid_old = cand_sids[b]
            old_node = sid_rows.get(sid_old)
            if old_node is None:
                continue
            # Degeneracy-aware, noise-calibrated edge information.
            # SHAPE comes from the fine-stage objective Hessian's
            # spectrum (the reference takes Q = (-H)^-1 * coe,
            # src/PoseEstimator.cpp:52-64): in a corridor the
            # along-axis eigenvalue sits orders of magnitude below the
            # others — a slid-but-locally-perfect match (the classic
            # corridor aliasing failure, observed at 23/95 accepted
            # edges on the killian fixture, errors to 4.4 m at 0 deg)
            # is wrong EXACTLY along that weak direction, so its weight
            # must follow the spectrum down to ~zero. The old floor
            # (clip up to 1.0) kept real weight there and warped the
            # graph by meters. SCALE: the raw Hessian (~1e6) would give
            # the strong directions mm-level confidence; instead the
            # strongest direction is calibrated to the verify
            # residual: sigma = max(sqrt(icp mean-sq err),
            # loop_info_sigma_floor), conservative because per-point
            # errors are correlated (no sqrt-N bonus).
            cfg = self.cfg
            w, V = np.linalg.eigh((H + H.T) / 2)
            w = np.clip(w, 0.0, None)
            wmax = max(float(w[-1]), 1e-9)
            sigma = max(np.sqrt(max(cost_b, 0.0)),
                        cfg.loop_info_sigma_floor)
            omega = (V * (w * ((1.0 / sigma ** 2) / wmax))) @ V.T
            self.loop_edges.append(
                (old_node, cur_node, z_rad, omega.astype(np.float32))
            )
            self.edge_log.append({
                "sid_old": int(sid_old), "sid_new": int(sid),
                "z_rad": z_rad.tolist(),
                "cost": cost_b,
                "overlap": overlap_b,
                "overlap_tgt": overlap_tgt_b,
                "eigs": np.linalg.eigvalsh(
                    (H + H.T) / 2).tolist(),
            })
            self.loops_accepted += 1
            self._pending_edges += 1

    def flush(self) -> Optional[np.ndarray]:
        """Apply deferred loop edges (end-of-run finalization when
        cfg.loop_opt_min_frames postponed the last correction); also
        resolves any still-in-flight async verification first."""
        import time as _time

        t0 = _time.perf_counter()
        self._resolve_verify()
        self.t_verify += _time.perf_counter() - t0
        if self._pending_edges == 0:
            return None
        self._pending_edges = 0
        self._last_opt_node = len(self.node_poses_rad) - 1
        t1 = _time.perf_counter()
        out = self.optimize_all()
        self.t_optimize += _time.perf_counter() - t1
        return out

    # ---- optimization --------------------------------------------------
    def optimize_all(self) -> np.ndarray:
        """Optimize the whole graph; update node poses and keyframe
        poses; return corrected per-frame poses (degrees).

        Small graphs take the dense [3N,3N] GN solve; past
        `cfg.pgo_dense_max_nodes` the hierarchical solver runs instead
        (chain condensation + coarse dense + matrix-free PCG polish) so
        a MIT-Killian-length run never factorizes an N^2 matrix."""
        cfg = self.cfg
        n = len(self.node_poses_rad)
        if n > cfg.pgo_dense_max_nodes and len(self.odom_edges) == n - 1:
            new_poses = optimize_hierarchical(
                np.stack(self.node_poses_rad),
                np.stack([z for z, _ in self.odom_edges]),
                np.stack([w for _, w in self.odom_edges]),
                np.array([i for i, _, _, _ in self.loop_edges], np.int32),
                np.array([j for _, j, _, _ in self.loop_edges], np.int32),
                (np.stack([z for _, _, z, _ in self.loop_edges])
                 if self.loop_edges else np.zeros((0, 3), np.float32)),
                (np.stack([w for _, _, _, w in self.loop_edges])
                 if self.loop_edges else np.zeros((0, 3, 3), np.float32)),
                seg_len=cfg.pgo_seg_len,
                coarse_iterations=cfg.pgo_iterations,
                fine_iterations=cfg.pgo_fine_iterations,
                cg_iters=cfg.pgo_cg_iters,
                cycles=cfg.pgo_cycles,
            )
        else:
            e = (n - 1) + len(self.loop_edges)
            N = _next_pow2(max(n, 16))
            E = _next_pow2(max(e, 16))

            poses = np.zeros((N, 3), np.float32)
            poses[:n] = np.stack(self.node_poses_rad)
            nm = np.zeros(N, bool); nm[:n] = True
            ii = np.zeros(E, np.int32); jj = np.zeros(E, np.int32)
            zz = np.zeros((E, 3), np.float32)
            om = np.zeros((E, 3, 3), np.float32)
            em = np.zeros(E, bool)
            for t, (z, w) in enumerate(self.odom_edges):
                ii[t], jj[t], zz[t], om[t], em[t] = t, t + 1, z, w, True
            for t, (i, j, z, w) in enumerate(self.loop_edges, start=n - 1):
                ii[t], jj[t], zz[t], om[t], em[t] = i, j, z, w, True

            g = PoseGraph(
                poses_rad=jnp.asarray(poses), node_mask=jnp.asarray(nm),
                idx_i=jnp.asarray(ii), idx_j=jnp.asarray(jj),
                z_rad=jnp.asarray(zz), omega=jnp.asarray(om),
                edge_mask=jnp.asarray(em),
            )
            new_poses, _chi2 = optimize(g, iterations=cfg.pgo_iterations)
            new_poses = np.asarray(new_poses)[:n]
        self.node_poses_rad = [p.copy() for p in new_poses]

        out_deg = np.stack([self._pose_rad_to_deg(p) for p in new_poses])
        sid_rows = {v: i for i, v in enumerate(self.node_sids)}
        self.keyframes.update_poses(out_deg, sid_rows.get)
        return out_deg
