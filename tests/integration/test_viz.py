"""Visualization export smoke test (VERDICT r1 missing #5 / next #7):
the rviz analog must produce a readable PNG from a simulator run."""

import os

import numpy as np

from ndt_slam_tpu.config import SlamConfig
from ndt_slam_tpu.io.simulate import simulate_sequence
from ndt_slam_tpu.pipeline.runner import run_slam
from ndt_slam_tpu.viz import render_map_png


def test_render_map_png_writes_file(tmp_path):
    path = str(tmp_path / "m.png")
    rng = np.random.default_rng(0)
    map_xy = rng.uniform(-5, 5, (500, 2)).astype(np.float32)
    poses = np.stack([np.linspace(0, 3, 20), np.zeros(20),
                      np.zeros(20)], 1).astype(np.float32)
    out = render_map_png(path, map_xy, poses, loop_edges=[(0, 19)])
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_runner_viz_outputs(tmp_path):
    frames = simulate_sequence(n_frames=10, beams=181, seed=2)
    cfg = SlamConfig.small(end_frame=10)
    out_dir = str(tmp_path / "out")
    run_slam(frames, cfg, out_dir=out_dir, viz_every=4, viz_final=True)
    assert os.path.exists(os.path.join(out_dir, "map.png"))
    assert os.path.exists(os.path.join(out_dir, "viz_00004.png"))
    assert os.path.exists(os.path.join(out_dir, "viz_00008.png"))
