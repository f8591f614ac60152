"""GraphBackend unit tests: the correction_due predictor interface and
host-side cache hygiene.

correction_due is the contract between the backend's deferral logic
(try_close) and schedulers that predict corrections before resolution
(PipelinedFrontEnd._flush_predicted). VERDICT r4 weak #5: the old
predictor read _pending_edges/_last_opt_node and re-derived the
condition inline, so a change to the backend's deferral silently
de-tuned the flush heuristic. This test pins the two together: for a
sweep of backend states, the prediction must equal what the
_backend_hook + try_close pair actually does.
"""

import numpy as np
import pytest

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.core.points import pad_points
from ndt_slam_tpu.graph.backend import GraphBackend


def _cfg(**kw):
    base = dict(
        loop_enable=True,
        loop_opt_min_frames=5,
        loop_check_skip=2,
        loop_min_frame_gap=10 ** 6,  # no candidates ever → no dispatch
        pgo_iterations=2,
    )
    base.update(kw)
    return SlamConfig.small(**base)


def _scan(cfg):
    pts = np.stack([np.linspace(0.0, 1.0, 32),
                    np.zeros(32, np.float32)], axis=1).astype(np.float32)
    return pad_points(pts, cfg.max_scan_points)


def _backend_with(cfg, n_nodes, pending, last_opt_node):
    be = GraphBackend(cfg)
    scan = _scan(cfg)
    cov = np.eye(3, dtype=np.float32) * 1e-4
    for i in range(n_nodes):
        be.add_frame(i, np.array([0.1 * i, 0.0, 0.0], np.float32),
                     cov, scan)
    if pending:
        # inject an accepted loop edge awaiting the deferred optimize
        z = np.zeros(3, np.float32)
        om = np.eye(3, dtype=np.float32)
        be.loop_edges.append((0, n_nodes - 1, z, om))
        be._pending_edges = pending
    be._last_opt_node = last_opt_node
    return be, scan


@pytest.mark.parametrize("pending", [0, 1, 3])
@pytest.mark.parametrize("last_opt_node", [-(10 ** 9), 0, 4, 7, 11])
@pytest.mark.parametrize("n_nodes", [6, 9, 12, 13])
def test_correction_due_matches_try_close(pending, last_opt_node, n_nodes):
    """correction_due(node) == (the _backend_hook cadence fires AND
    try_close runs a correction) for that node — over pending-edge
    counts, deferral windows, and cadence phases."""
    cfg = _cfg()
    be, scan = _backend_with(cfg, n_nodes, pending, last_opt_node)
    node = n_nodes - 1  # the just-added frame's node index
    predicted = be.correction_due(node)

    # what _backend_hook + try_close actually do for this frame
    # (pipeline/frontend.py:407: check on the loop_check_skip cadence)
    on_cadence = node % max(1, cfg.loop_check_skip) == 0
    actual = False
    if on_cadence:
        out = be.try_close(
            node, np.array([0.1 * node, 0.0, 0.0], np.float32), scan
        )
        actual = out is not None
    assert predicted == actual


def test_correction_due_ignores_inflight_verify():
    """Edges still in async-verify flight are invisible to the
    predictor by design (documented rare case: normal rollback path)."""
    cfg = _cfg()
    be, _ = _backend_with(cfg, 12, pending=0, last_opt_node=-(10 ** 9))
    assert not be.correction_due(11)


def test_host_scan_cache_evicts_decimated_sids():
    """ADVICE r4: the sharded-verify host-copy cache must not keep
    entries for keyframes dropped by decimation."""
    cfg = _cfg()
    be, scan = _backend_with(cfg, 4, pending=0, last_opt_node=0)
    # simulate cached copies for sids 0..9, then decimate the store
    for s in range(10):
        be._host_scan_cache[s] = (np.zeros((4, 2)), np.zeros(4, bool))
    be.keyframes.sids = [0, 2, 4, 6, 8]
    be._evict_stale_scan_cache()
    assert set(be._host_scan_cache) == set(be.keyframes.sids)


def test_feed_prefetched_consumed_once_and_identity_checked():
    """The pipelined frontend folds the in-flight verify fetch into
    its chunk fetch (backend.feed_prefetched). The stashed rows must
    be used ONLY for the matching in-flight packed array (a new
    dispatch between prefetch and resolve invalidates them) and must
    be cleared after one resolve."""
    import jax.numpy as jnp

    cfg = _cfg()
    be = GraphBackend(cfg)
    # fabricate an in-flight verification whose packed rows accept
    # nothing (cost high / accepted flag 0), so resolve is a no-op
    # beyond consuming the prefetch
    B = cfg.loop_max_candidates
    packed = jnp.zeros((B, 16), jnp.float32)
    be._inflight = (0, [], packed)
    assert be.inflight_packed() is packed

    be.feed_prefetched(np.zeros((B, 16), np.float32))
    assert be._prefetched is not None
    be._resolve_verify()
    # consumed and cleared; nothing left in flight
    assert be._prefetched is None
    assert be._inflight is None
    assert be.inflight_packed() is None

    # identity mismatch: prefetched rows for an OLD dispatch must not
    # be applied to a NEW in-flight array
    be._inflight = (0, [], packed)
    be.feed_prefetched(np.zeros((B, 16), np.float32))
    other = jnp.ones((B, 16), jnp.float32)
    be._inflight = (1, [], other)  # new dispatch superseded the old
    be._resolve_verify()  # must fall back to device_get(other), not
    assert be._prefetched is None  # reuse the stale prefetch
    assert be._inflight is None
