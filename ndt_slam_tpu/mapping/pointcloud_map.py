"""Submap-structured point-cloud map.

Replicates the reference PointCloudMap/Submap behavior (reference:
src/PointCloudMap.cpp:15-134, include/ndt_slam/PointCloudMap.h:23-145)
with a TPU-native split of responsibilities:

- Device side: every per-frame compute (voxel filter, occupancy diff,
  neighbor rejection, buffer appends) is a fixed-shape jitted op over
  capacity-padded buffers — shapes never change, nothing recompiles.
- Host side: the submap open/close decision (accumulated travel
  distance vs sep_thre) and the list of submaps, i.e. pure bookkeeping,
  exactly the role the host plays in any accelerator input pipeline.

Key behavioral parity points (SURVEY.md §6.3):
- a new submap is seeded with the previous submap's last TWO raw scans
  (dynamic-removal continuity, src/PointCloudMap.cpp:79-83);
- the first submap keeps its scan[0] raw forever (makeMap cntS==0
  branch) — including the n=1 duplication quirk;
- the NDT local map = previous submap's closed (filtered) cloud +
  voxel-filtered current cloud (src/PointCloudMap.cpp:119-134);
- dynamic removal: interior scan i+1 is filtered against candidates
  from diff(scan_i ∪ scan_{i+2} -> scan_{i+1}). The reference
  reprocesses the whole submap every frame, O(scans^2); here each
  interior is processed exactly once, when its right neighbor arrives
  — the final clouds are identical because the pass only depends on
  the 3-scan window (SURVEY.md §6.3 item 8).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core.points import PointBuffer, PAD_COORD, compact
from ndt_slam_tpu.mapping.voxel import voxel_filter
from ndt_slam_tpu.mapping.dynamic import process_interior_scan


def _append_rows(dst: PointBuffer, dst_count, src: PointBuffer):
    """Append src's valid points into dst at dst_count (drop overflow);
    also returns the (compacted src, appended-row mask) so callers can
    mirror EXACTLY which rows landed (the incremental moment lattice
    must not count overflow-dropped points the buffer never got)."""
    s = compact(src)
    idx = dst_count + jnp.arange(s.capacity, dtype=jnp.int32)
    ok = s.mask & (idx < dst.capacity)
    idx = jnp.where(ok, idx, dst.capacity)  # out-of-bounds -> dropped
    xy = dst.xy.at[idx].set(s.xy, mode="drop")
    mask = dst.mask.at[idx].set(ok, mode="drop")
    out = (PointBuffer(xy, mask),
           dst_count + jnp.sum(ok.astype(jnp.int32)))
    return out[0], out[1], s, ok


@jax.jit
def _append(dst: PointBuffer, dst_count, src: PointBuffer):
    """Append src's valid points into dst at dst_count (drop overflow)."""
    buf, count, _, _ = _append_rows(dst, dst_count, src)
    return buf, count


@partial(jax.jit, static_argnames=("capacity",))
def _concat(a: PointBuffer, b: PointBuffer, capacity: int) -> PointBuffer:
    """Concatenate PREFIX-COMPACT `a` with (arbitrarily masked) `b`
    into a `capacity` buffer: b's valid points are spliced in right
    after a's valid prefix — an O(capacity) scatter, NO big sort.

    Contract: a's valid points must occupy a prefix of its buffer.
    Every map-path producer guarantees this — `_append` writes at the
    running count, `voxel_filter` enumerates segments from 0, and
    `_concat` itself emits prefix-compact output. The old
    generic-compact version sorted the full union (131k rows for the
    registration target) on EVERY frame; that sort dominated the
    batched map step (~0.9 s/tick for 8 sequences on a v5e).
    Output is identical (same points, same order: a's prefix, then b's
    valid points in stable order)."""
    a_n = jnp.sum(a.mask.astype(jnp.int32))
    bc = compact(b)  # small: b is a scan/submap tail, not the union
    if a.capacity >= capacity:
        base_xy, base_mask = a.xy[:capacity], a.mask[:capacity]
    else:
        pad = capacity - a.capacity
        base_xy = jnp.concatenate(
            [a.xy, jnp.full((pad, 2), PAD_COORD, a.xy.dtype)]
        )
        base_mask = jnp.concatenate(
            [a.mask, jnp.zeros((pad,), bool)]
        )
    idx = a_n + jnp.arange(bc.capacity, dtype=jnp.int32)
    ok = bc.mask & (idx < capacity)
    idx = jnp.where(ok, idx, capacity)  # out-of-bounds -> dropped
    xy = base_xy.at[idx].set(bc.xy, mode="drop")
    mask = base_mask.at[idx].set(ok, mode="drop")
    xy = jnp.where(mask[:, None], xy, PAD_COORD)
    return PointBuffer(xy, mask)


@partial(jax.jit, static_argnames=("leaf",))
def _voxel(buf: PointBuffer, leaf: float) -> PointBuffer:
    return voxel_filter(buf, leaf)


@partial(jax.jit, static_argnames=("resol", "thre"))
def _interior(prev, cur, nxt, resol: float, thre: float) -> PointBuffer:
    return process_interior_scan(prev, cur, nxt, resol, thre)


@partial(jax.jit, static_argnames=(
    "append_scan", "do_interior", "include_newest", "has_prev",
    "filtered", "cap_sub", "cap_local", "resol", "thre", "leaf"))
def _add_scan_and_target(
    proc: PointBuffer, proc_count, raw_a: PointBuffer, raw_b: PointBuffer,
    scan: PointBuffer, prev: PointBuffer, *,
    append_scan: bool, do_interior: bool, include_newest: bool,
    has_prev: bool, filtered: bool, cap_sub: int, cap_local: int,
    resol: float, thre: float, leaf: float,
):
    """Fused per-frame map update: Submap.add_scan (raw append and/or
    interior dynamic-removal pass) + Submap.cloud() + the next frame's
    registration target, all in ONE device program. The unfused path
    costs 4-5 separate dispatches per frame; on a remote TPU each
    dispatch is a tunnel round trip, so the sequential pipeline is
    latency-bound on exactly these. Branch flags are static — one
    compiled variant per (phase of run), identical numerics to the
    unfused ops (parity-tested in tests/unit/test_mapping.py).

    `raw_a`/`raw_b` are the submap's last two raw scans (ignored unless
    `do_interior`); `prev` is the previous submap's closed cloud
    (ignored unless `has_prev`). Returns (proc, proc_count, target).
    """
    if append_scan:
        proc, proc_count = _append(proc, proc_count, scan)
    if do_interior:
        processed = process_interior_scan(raw_a, raw_b, scan, resol, thre)
        proc, proc_count = _append(proc, proc_count, processed)
    cloud = _concat(proc, scan, cap_sub) if include_newest else proc
    cur_t = voxel_filter(cloud, leaf) if filtered else cloud
    if has_prev:
        target = _concat(prev, cur_t, cap_local)
    else:
        target = _concat(cur_t, PointBuffer.empty(1), cap_local)
    return proc, proc_count, target


@partial(jax.jit, static_argnames=(
    "append_scan", "do_interior", "include_newest", "has_prev",
    "filtered", "cap_sub", "cap_local", "resol", "thre", "leaf",
    "mom_cells", "grid_res"))
def _add_scan_target_mom(
    proc: PointBuffer, proc_count, raw_a: PointBuffer, raw_b: PointBuffer,
    scan: PointBuffer, prev: PointBuffer, mom, mom_anchor, *,
    append_scan: bool, do_interior: bool, include_newest: bool,
    has_prev: bool, filtered: bool, cap_sub: int, cap_local: int,
    resol: float, thre: float, leaf: float,
    mom_cells: int, grid_res: float,
):
    """`_add_scan_and_target` + the incremental NDT moment-lattice
    update, one device program (VERDICT r4 next-round #2). `mom`
    [mom_cells^2, 6] carries the running moments of (previous submap's
    closed cloud + current submap's proc buffer); every row this call
    appends to `proc` is also scattered into `mom` — ~2k points per
    frame instead of the registration step rescattering the whole
    131k-point target buffer. Returns (proc, count, target, mom)."""
    from ndt_slam_tpu.ndt.grid import moments_abs

    if append_scan:
        proc, proc_count, s_rows, s_ok = _append_rows(
            proc, proc_count, scan
        )
        mom = mom + moments_abs(
            s_rows.xy, s_ok, mom_anchor, mom_cells, mom_cells, grid_res
        )
    if do_interior:
        processed = process_interior_scan(raw_a, raw_b, scan, resol, thre)
        proc, proc_count, p_rows, p_ok = _append_rows(
            proc, proc_count, processed
        )
        mom = mom + moments_abs(
            p_rows.xy, p_ok, mom_anchor, mom_cells, mom_cells, grid_res
        )
    cloud = _concat(proc, scan, cap_sub) if include_newest else proc
    cur_t = voxel_filter(cloud, leaf) if filtered else cloud
    if has_prev:
        target = _concat(prev, cur_t, cap_local)
    else:
        target = _concat(cur_t, PointBuffer.empty(1), cap_local)
    return proc, proc_count, target, mom


@partial(jax.jit, static_argnames=("mom_cells", "grid_res", "has_prev"))
def _rebuild_mom(prev: PointBuffer, proc: PointBuffer, mom_anchor, *,
                 mom_cells: int, grid_res: float, has_prev: bool):
    """From-scratch moment lattice: previous submap's closed cloud +
    the current proc buffer (the additive part of the registration
    target — the newest raw scan is added per frame at registration).
    Runs on submap close / bootstrap / remake / checkpoint load; the
    hot path only ever ADDS to the result (_add_scan_target_mom)."""
    from ndt_slam_tpu.ndt.grid import moments_abs

    mom = moments_abs(
        proc.xy, proc.mask, mom_anchor, mom_cells, mom_cells, grid_res
    )
    if has_prev:
        mom = mom + moments_abs(
            prev.xy, prev.mask, mom_anchor, mom_cells, mom_cells, grid_res
        )
    return mom


@partial(jax.jit, static_argnames=(
    "remove_moving", "is_first", "cap_sub", "resol", "thre", "leaf",
    "do_close"))
def _rebuild_submap_fused(
    scans_xy,      # [n, S, 2] local-frame scans (padded along n)
    scans_mask,    # [n, S]
    poses_deg,     # [n, 3] corrected poses
    active,        # [n] bool: real scan vs n-padding
    carried,       # [n] bool: seeded from the previous submap
    *, remove_moving: bool, is_first: bool, cap_sub: int,
    resol: float, thre: float, leaf: float, do_close: bool,
):
    """Replay a whole submap's add_scan sequence in ONE device program —
    the incremental remake path dispatches once per rebuilt submap
    instead of ~3x per scan, which over a remote-TPU tunnel is the
    difference between map rewrites costing less than registration and
    costing 3x more (VERDICT r2 next-round #2). The interior
    dynamic-removal pass depends only on its own 3-scan window, so all
    windows run as ONE vmap and the buffer fills with a single
    flatten+compact append (no sequential carry, no per-step sorts).
    Branch semantics mirror Submap.step_flags()/add_scan exactly
    (parity: tests/unit/test_mapping.py remake tests vs forward maps).

    Returns (proc_xy, proc_mask, proc_count, proj_xy, proj_mask,
    closed_xy, closed_mask); closed_* is the voxel-filtered final cloud
    (meaningful only when do_close).
    """
    from ndt_slam_tpu.core.pose2 import global_points

    n = scans_xy.shape[0]
    proj = jax.vmap(global_points)(poses_deg, scans_xy)
    proj_mask = scans_mask & active[:, None]
    proj = jnp.where(proj_mask[:, :, None], proj, PAD_COORD)

    idx = jnp.arange(n)
    if remove_moving:
        append_f = active & (idx == 0) if is_first else jnp.zeros(n, bool)
        interior_f = active & (idx >= 2)
    else:
        append_f = active & (jnp.ones(n, bool) if is_first else ~carried)
        interior_f = jnp.zeros(n, bool)

    if remove_moving:
        dummy_xy = jnp.full_like(proj[:1], PAD_COORD)
        dummy_m = jnp.zeros_like(proj_mask[:1])
        prev1 = jnp.concatenate([dummy_xy, proj[:-1]])
        prev1_m = jnp.concatenate([dummy_m, proj_mask[:-1]])
        prev2 = jnp.concatenate([dummy_xy, dummy_xy, proj[:-2]])
        prev2_m = jnp.concatenate([dummy_m, dummy_m, proj_mask[:-2]])
        processed = jax.vmap(
            lambda p2, m2, p1, m1, c, mc: process_interior_scan(
                PointBuffer(p2, m2), PointBuffer(p1, m1),
                PointBuffer(c, mc), resol, thre,
            )
        )(prev2, prev2_m, prev1, prev1_m, proj, proj_mask)
        # interleave (append_i, interior_i) rows to preserve the exact
        # forward add_scan ordering in the buffer
        all_xy = jnp.stack([proj, processed.xy], axis=1)
        all_mask = jnp.stack(
            [proj_mask & append_f[:, None],
             processed.mask & interior_f[:, None]],
            axis=1,
        )
    else:
        all_xy = proj[:, None]
        all_mask = (proj_mask & append_f[:, None])[:, None]
    flat = PointBuffer(
        all_xy.reshape(-1, 2), all_mask.reshape(-1)
    )
    proc, count = _append(
        PointBuffer.empty(cap_sub), jnp.int32(0), flat
    )

    if do_close:
        if remove_moving:
            # newest raw scan rides along in the assembled cloud —
            # the last ACTIVE slot (n may be padded past the real count)
            last_i = jnp.maximum(
                jnp.sum(active.astype(jnp.int32)) - 1, 0
            )
            last = PointBuffer(proj[last_i], proj_mask[last_i])
            cloud = _concat(proc, last, cap_sub)
        else:
            cloud = proc
        closed = voxel_filter(cloud, leaf)
        closed_xy, closed_mask = closed.xy, closed.mask
    else:
        closed_xy = jnp.zeros((1, 2), jnp.float32)
        closed_mask = jnp.zeros((1,), bool)
    return (proc.xy, proc.mask, count, proj, proj_mask,
            closed_xy, closed_mask)


class Submap:
    """One submap: accumulated processed cloud + the raw 3-scan tail."""

    def __init__(self, cfg: SlamConfig, atd_s: float, cnt_s: int):
        self.cfg = cfg
        self.atd_s = atd_s
        self.cnt_s = cnt_s          # global pose index of first scan
        self.cnt_e: Optional[int] = None
        self.proc = PointBuffer.empty(cfg.max_submap_points)
        self.proc_count = jnp.int32(0)
        self.raw: List[PointBuffer] = []   # last 3 raw scans (device)
        self.n_scans = 0
        self.final_cloud: Optional[PointBuffer] = None  # set on close
        self.is_first = cnt_s == 0

    def _push_raw(self, scan: PointBuffer):
        self.raw.append(scan)
        if len(self.raw) > 3:
            self.raw.pop(0)

    def step_flags(self) -> tuple[bool, bool, bool]:
        """(append_scan, do_interior, include_newest) for adding the
        NEXT scan — the single source of truth for the per-scan branch
        logic, shared by `add_scan` (unfused) and
        `PointCloudMap._add_scan_fused` so the two paths cannot
        silently desynchronize (parity:
        tests/unit/test_mapping.py::test_fused_add_points_matches_unfused).

        remove_moving: only the FIRST submap's first scan is appended
        raw (reference makeMap cntS==0 branch); an interior pass runs
        once 3 raw scans exist; the newest raw scan rides along in
        `cloud()`. Without remove_moving: plain append, no interior,
        newest already appended.
        """
        if self.cfg.remove_moving:
            return (self.is_first and self.n_scans == 0,
                    self.n_scans + 1 >= 3,
                    True)
        return (True, False, False)

    def add_scan(self, scan: PointBuffer, carried: bool = False):
        """Add one scan (map-frame points). `carried` marks the two scans
        inherited from the previous submap at creation."""
        cfg = self.cfg
        append_scan, do_interior, _ = self.step_flags()
        if not cfg.remove_moving and carried and not self.is_first:
            # non-first submaps skip the 2 carried scans in the plain-
            # concat mode (reference: src/PointCloudMap.cpp:33-37)
            append_scan = False
        self._push_raw(scan)
        self.n_scans += 1
        if append_scan:
            self.proc, self.proc_count = _append(
                self.proc, self.proc_count, scan
            )
        if do_interior:
            processed = _interior(
                self.raw[-3], self.raw[-2], self.raw[-1],
                cfg.diff_resol, cfg.thre_neighbor,
            )
            self.proc, self.proc_count = _append(
                self.proc, self.proc_count, processed
            )

    def cloud(self) -> PointBuffer:
        """Current assembled cloud (reference: Submap::makeMap output)."""
        if self.cfg.remove_moving and self.raw:
            return _concat(self.proc, self.raw[-1], self.cfg.max_submap_points)
        return self.proc

    def close(self):
        """Voxel-filter and freeze (reference: submap separation path,
        src/PointCloudMap.cpp:72-77)."""
        self.final_cloud = _voxel(self.cloud(), self.cfg.submap_leaf_size)


class PointCloudMap:
    """Trajectory + submaps + local/global map assembly."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.poses: List[np.ndarray] = []        # fused poses (deg)
        self.atd = 0.0
        self.submaps: List[Submap] = [Submap(cfg, 0.0, 0)]
        self.last_pose = np.zeros(3, dtype=np.float32)
        self.last_scan: Optional[PointBuffer] = None
        # raw local-frame scans kept for post-loop-closure remake: the
        # host copy is canonical (checkpointed); local_scans_dev caches
        # the PADDED device buffer per frame so remake stacks device
        # references instead of re-uploading host-padded arrays (~1 MB
        # per rebuilt submap over a remote-TPU tunnel — measured as the
        # bulk of t_remake). Entries may be None (checkpoint load,
        # batch mode); _rebuild_submap fills them lazily.
        self.local_scans: List[np.ndarray] = []
        self.local_scans_dev: List[Optional[PointBuffer]] = []
        self._dummy_scan_dev: Optional[PointBuffer] = None
        # registration target precomputed by the fused add_points path
        # (valid until the next map mutation)
        self._cached_target: Optional[PointBuffer] = None
        # incremental remake_maps observability (see remake_maps)
        self.remake_stats = {"calls": 0, "rebuilt": 0, "kept": 0}
        # incremental NDT moment lattice (cfg.ndt_incremental_grid):
        # running moments of (prev submap's closed cloud + current proc
        # buffer), updated additively by the fused add path and rebuilt
        # from scratch on the rare mutations that bypass it (submap
        # close, remake, checkpoint load, batch/unfused adds)
        self._mom: Optional[jnp.ndarray] = None
        self._mom_anchor: Optional[jnp.ndarray] = None
        self._mom_valid = False

    # -- reference: PointCloudMap::addPose (src/PointCloudMap.cpp:44-55)
    def add_pose(self, pose_deg: np.ndarray):
        pose_deg = np.asarray(pose_deg, dtype=np.float32)
        if self.poses:
            pp = self.poses[-1]
            self.atd += float(np.hypot(pose_deg[0] - pp[0], pose_deg[1] - pp[1]))
        self.poses.append(pose_deg)

    # -- reference: PointCloudMap::addPoints (src/PointCloudMap.cpp:58-91)
    def add_points(self, scan_map_frame: PointBuffer,
                   make_target: bool = False):
        """Append one map-frame scan. With `make_target=True` the common
        (no submap-close) path runs as ONE fused device program that
        also assembles the next frame's registration target (cached;
        `registration_target()` returns it without further dispatches).
        """
        cfg = self.cfg
        cur = self.submaps[-1]
        self._cached_target = None
        if self.atd - cur.atd_s >= cfg.submap_sep_thre:
            cur.cnt_e = len(self.poses) - 2
            cur.close()
            new = Submap(cfg, self.atd, len(self.poses) - 1)
            # seed with the previous submap's last two raw scans
            for s in cur.raw[-2:]:
                new.add_scan(s, carried=True)
            new.add_scan(scan_map_frame)
            self.submaps.append(new)
            self._mom_valid = False
        elif make_target:
            self._cached_target = self._add_scan_fused(cur, scan_map_frame)
        else:
            cur.add_scan(scan_map_frame)
            self._mom_valid = False

    def fused_add_flags(self):
        """Static flags of `_add_scan_and_target` for the CURRENT frame
        (host counters only — safe to call while the device buffers are
        stack-resident in the batch runner), or None when this frame
        takes the submap-close path."""
        cfg = self.cfg
        cur = self.submaps[-1]
        if self.atd - cur.atd_s >= cfg.submap_sep_thre:
            return None
        append_scan, do_interior, include_newest = cur.step_flags()
        return dict(
            append_scan=append_scan, do_interior=do_interior,
            include_newest=include_newest,
            has_prev=len(self.submaps) >= 2,
            filtered=cfg.ndt_target_filtered,
            cap_sub=cfg.max_submap_points,
            cap_local=cfg.max_local_map_points,
            resol=cfg.diff_resol, thre=cfg.thre_neighbor,
            leaf=cfg.submap_leaf_size,
        )

    def fused_add_operands(self, scan: PointBuffer):
        """(static_flags, operands) for `_add_scan_and_target` matching
        exactly what Submap.add_scan + registration_target() would do
        for the CURRENT frame, or None when this frame takes the
        submap-close path (rare; callers fall back to `add_points`)."""
        flags = self.fused_add_flags()
        if flags is None:
            return None
        cur = self.submaps[-1]
        prev = (self.submaps[-2].final_cloud if flags["has_prev"]
                else PointBuffer.empty(1))
        raw_a = cur.raw[-2] if len(cur.raw) >= 2 else scan
        raw_b = cur.raw[-1] if len(cur.raw) >= 1 else scan
        return flags, (cur.proc, cur.proc_count, raw_a, raw_b, scan, prev)

    def commit_fused_add(self, scan: PointBuffer, proc: PointBuffer,
                         count, target: PointBuffer) -> None:
        """Apply the results of an (externally executed)
        `_add_scan_and_target` for `scan` — the bookkeeping half of
        `_add_scan_fused`."""
        cur = self.submaps[-1]
        cur._push_raw(scan)
        cur.n_scans += 1
        cur.proc, cur.proc_count = proc, count
        self._cached_target = target

    def mom_state(self):
        """(mom [B*B,6], anchor [2]i32) of the incremental lattice,
        rebuilding from scratch if a bypassing mutation invalidated it.
        The anchor centers on the OPEN submap's first pose, with margin
        sized by resolved_grid_mom_cells so every frame window within
        the submap's travel fits (the registration step still emits a
        per-frame in-range flag as the loud fallback)."""
        cfg = self.cfg
        if not self._mom_valid:
            B = cfg.resolved_grid_mom_cells
            cur = self.submaps[-1]
            first = (self.poses[cur.cnt_s] if self.poses
                     else np.zeros(3, np.float32))
            anchor = np.floor(
                np.asarray(first[:2], np.float32) / cfg.ndt_resolution
                - B / 2.0
            ).astype(np.int32)
            self._mom_anchor = jnp.asarray(anchor)
            has_prev = len(self.submaps) >= 2
            prev = (self.submaps[-2].final_cloud if has_prev
                    else PointBuffer.empty(1))
            self._mom = _rebuild_mom(
                prev, cur.proc, self._mom_anchor,
                mom_cells=B, grid_res=cfg.ndt_resolution,
                has_prev=has_prev,
            )
            self._mom_valid = True
        return self._mom, self._mom_anchor

    def newest_raw(self) -> Optional[PointBuffer]:
        """The open submap's newest raw scan (map frame) — the
        non-additive part of the registration target under
        remove_moving (rides along in cloud(), not in proc/lattice)."""
        cur = self.submaps[-1]
        return cur.raw[-1] if cur.raw else None

    def _add_scan_fused(self, cur: Submap, scan: PointBuffer) -> PointBuffer:
        """Run the fused per-frame map update for this frame and apply
        it (the mom-aware variant when the incremental grid is on)."""
        flags, ops = self.fused_add_operands(scan)
        if self.cfg.resolved_ndt_incremental_grid:
            mom, anchor = self.mom_state()
            proc, count, target, mom = _add_scan_target_mom(
                *ops, mom, anchor, **flags,
                mom_cells=self.cfg.resolved_grid_mom_cells,
                grid_res=self.cfg.ndt_resolution,
            )
            self._mom = mom
        else:
            proc, count, target = _add_scan_and_target(*ops, **flags)
        self.commit_fused_add(scan, proc, count, target)
        return target

    # -- reference: PointCloudMap::makeLocalMap (src/PointCloudMap.cpp:119-134)
    def local_map(self) -> PointBuffer:
        cfg = self.cfg
        cur = self.submaps[-1]
        cur_filtered = _voxel(cur.cloud(), cfg.submap_leaf_size)
        if len(self.submaps) >= 2:
            prev = self.submaps[-2].final_cloud
            return _concat(prev, cur_filtered, cfg.max_local_map_points)
        return _concat(
            cur_filtered, PointBuffer.empty(1), cfg.max_local_map_points
        )

    def registration_target(self) -> PointBuffer:
        """NDT target: previous submap's closed cloud + the CURRENT
        submap's unfiltered cloud.

        Deviation from the reference (documented): the reference voxel-
        filters the current submap before registration purely to save
        CPU (src/PointCloudMap.cpp:119-134). At 0.05 m leaf that caps
        wall density at ~6 points per 0.3 m NDT cell — right at PCL's
        min-points threshold — which starves the grid of valid cells
        during the first scans of a submap. On TPU the filter saves
        nothing, so the grid gets the raw accumulated cloud (denser,
        better-conditioned covariances); exports still use the filtered
        `local_map()` for output parity. Set cfg.ndt_target_filtered
        for the exact reference assembly (= local_map()).
        """
        if self._cached_target is not None:
            return self._cached_target
        cfg = self.cfg
        if cfg.ndt_target_filtered:
            return self.local_map()
        cur = self.submaps[-1].cloud()
        if len(self.submaps) >= 2:
            prev = self.submaps[-2].final_cloud
            return _concat(prev, cur, cfg.max_local_map_points)
        return _concat(cur, PointBuffer.empty(1), cfg.max_local_map_points)

    # -- reference: PointCloudMap::makeGlobalMap (src/PointCloudMap.cpp:96-116)
    def global_map(self) -> np.ndarray:
        """Host-side [M,2] float32 of all valid map points; also returns
        per-submap clouds via `submap_clouds()`."""
        return np.concatenate(self.submap_clouds(), axis=0) if self.poses else \
            np.zeros((0, 2), np.float32)

    def submap_clouds(self) -> List[np.ndarray]:
        out = []
        for sm in self.submaps[:-1]:
            c = sm.final_cloud
            xy = np.asarray(c.xy)[np.asarray(c.mask)]
            out.append(xy.astype(np.float32))
        cur = self.submaps[-1]
        f = _voxel(cur.cloud(), self.cfg.submap_leaf_size)
        out.append(np.asarray(f.xy)[np.asarray(f.mask)].astype(np.float32))
        return out

    # -- bookkeeping mirrors of setLastPose/setLastScan
    def set_last_pose(self, pose_deg: np.ndarray):
        self.last_pose = np.asarray(pose_deg, dtype=np.float32)

    def get_last_pose(self) -> np.ndarray:
        return self.last_pose

    def set_last_scan(self, scan: PointBuffer):
        self.last_scan = scan

    def record_local_scan(self, xy_local: np.ndarray,
                          padded: Optional[PointBuffer] = None):
        """Record a frame's local-frame scan for the remake path.
        `padded` is the already-padded device buffer when the caller
        has one (the sequential paths always do — it is the scan they
        just registered); without it the device cache entry stays None
        and remake pads/uploads lazily."""
        self.local_scans.append(np.asarray(xy_local, dtype=np.float32))
        self.local_scans_dev.append(padded)

    # -- reference: commented-out PointCloudMap::remakeMaps
    #    (src/PointCloudMap.cpp:136-171) — the reference's (never-run)
    #    version kept the submap partition fixed and re-projected each
    #    submap's points through the corrected poses. Same semantics
    #    here, made INCREMENTAL: submap boundaries stay frozen at the
    #    frame ranges recorded when each submap was built, and only
    #    submaps whose member poses moved beyond a threshold are
    #    rebuilt — after a loop closure most of the old trajectory
    #    barely moves, so corrections cost O(moved submaps), not O(n)
    #    (VERDICT r2 weak #3).
    def _rebuild_submap(
        self, sm: Submap, new_poses: np.ndarray, atd_s: float,
        is_open: bool,
    ) -> Submap:
        """Re-project one submap's scans through corrected poses over
        its FROZEN frame range (carried seeds + members), preserving
        every add_scan branch (first-scan-raw, carry-over, interior
        dynamic removal) exactly as the forward pass ran it — as ONE
        fused device program (_rebuild_submap_fused)."""
        from ndt_slam_tpu.core.points import pad_points

        cfg = self.cfg
        end = len(new_poses) if is_open else sm.cnt_e + 1
        lo = max(0, sm.cnt_s - 2) if sm.cnt_s > 0 else 0
        frames = list(range(lo, end))
        n = len(frames)
        n_pad = 8
        while n_pad < n:
            n_pad *= 2
        S = cfg.max_scan_points
        # Device-reference stacking: the per-frame padded scan buffers
        # already live on device (recorded at process time), so the
        # rebuild input is ONE stack dispatch of references instead of
        # a ~1 MB host-padded upload per rebuilt submap (round 3 had
        # already removed the per-scan round trips; this removes the
        # remaining per-submap upload — the bulk of t_remake at
        # killian scale). Cache misses (checkpoint load, batch mode)
        # pad/upload once and stay cached.
        rows = []
        for f in frames:
            d = self.local_scans_dev[f]
            if d is None:
                d = pad_points(self.local_scans[f], S)
                self.local_scans_dev[f] = d
            rows.append(d)
        if self._dummy_scan_dev is None or \
                self._dummy_scan_dev.capacity != S:
            self._dummy_scan_dev = PointBuffer.empty(S)
        dummy = self._dummy_scan_dev
        rows += [dummy] * (n_pad - n)
        ps = np.zeros((n_pad, 3), np.float32)
        ps[:n] = new_poses[frames]
        active = np.zeros(n_pad, bool)
        active[:n] = True
        carried = np.zeros(n_pad, bool)
        carried[: sm.cnt_s - lo] = True

        (proc_xy, proc_mask, count, proj, proj_mask,
         closed_xy, closed_mask) = _rebuild_submap_fused(
            jnp.stack([r.xy for r in rows]),
            jnp.stack([r.mask for r in rows]),
            jnp.asarray(ps),
            jnp.asarray(active), jnp.asarray(carried),
            remove_moving=cfg.remove_moving, is_first=sm.cnt_s == 0,
            cap_sub=cfg.max_submap_points, resol=cfg.diff_resol,
            thre=cfg.thre_neighbor, leaf=cfg.submap_leaf_size,
            do_close=not is_open,
        )
        new = Submap(cfg, atd_s, sm.cnt_s)
        new.proc = PointBuffer(proc_xy, proc_mask)
        new.proc_count = count
        new.n_scans = n
        new.raw = [
            PointBuffer(proj[i], proj_mask[i])
            for i in range(max(0, n - 3), n)
        ]
        if not is_open:
            new.cnt_e = sm.cnt_e
            new.final_cloud = PointBuffer(closed_xy, closed_mask)
        return new

    def remake_maps(
        self, new_poses_deg: np.ndarray,
        thresh_trans: float | None = None,
        thresh_rot: float | None = None,
    ):
        """Rewrite the map through pose-graph-corrected poses. A closed
        submap is rebuilt only if any pose it depends on (members + the
        two carried seed frames) moved more than (thresh_trans [m],
        thresh_rot [deg]); the open submap — the registration target —
        always rebuilds. Pass negative thresholds to force a full
        rebuild (0 still skips submaps whose poses are bit-identical).
        `remake_stats` records rebuilt/kept counts for observability."""
        from ndt_slam_tpu.core.angles import sub_deg

        cfg = self.cfg
        new_poses = np.asarray(new_poses_deg, dtype=np.float32)
        assert len(new_poses) == len(self.local_scans) == len(self.poses)
        tt = cfg.remake_thresh_trans if thresh_trans is None else thresh_trans
        tr = cfg.remake_thresh_rot if thresh_rot is None else thresh_rot

        old_poses = np.asarray(self.poses, dtype=np.float32)
        d_t = np.hypot(new_poses[:, 0] - old_poses[:, 0],
                       new_poses[:, 1] - old_poses[:, 1])
        d_r = np.abs(sub_deg(new_poses[:, 2], old_poses[:, 2]))
        moved = (d_t > tt) | (d_r > tr)

        # accumulated travel distance along the corrected trajectory
        seg = np.hypot(np.diff(new_poses[:, 0]), np.diff(new_poses[:, 1]))
        cum = np.concatenate([[0.0], np.cumsum(seg)])

        rebuilt = []
        n_rebuilt = n_kept = 0
        for k, sm in enumerate(self.submaps):
            is_open = k == len(self.submaps) - 1
            end = len(new_poses) if is_open else sm.cnt_e + 1
            lo = max(0, sm.cnt_s - 2) if sm.cnt_s > 0 else 0
            if is_open or moved[lo:end].any():
                rebuilt.append(self._rebuild_submap(
                    sm, new_poses, float(cum[sm.cnt_s]), is_open
                ))
                n_rebuilt += 1
            else:
                sm.atd_s = float(cum[sm.cnt_s])
                rebuilt.append(sm)
                n_kept += 1
        self.submaps = rebuilt
        self.poses = [p for p in new_poses]
        self.atd = float(cum[-1])
        self._cached_target = None
        self._mom_valid = False
        self.last_pose = new_poses[-1].copy()
        self.remake_stats["calls"] += 1
        self.remake_stats["rebuilt"] += n_rebuilt
        self.remake_stats["kept"] += n_kept
