"""Golden tests for the CARMEN log reader (io/carmen.py) — the entry
gate to the real-data acceptance metric (BASELINE.json configs 2-3).

Hand-constructed FLASER / ROBOTLASER1 lines with known geometry verify
the beam-angle convention, pose extraction, unit conversion, and
out-of-range masking; the committed office_loop fixture verifies the
end-to-end file path.
"""

import os

import numpy as np
import pytest

from ndt_slam_tpu.io.carmen import (
    read_carmen_gt, read_carmen_log,
)

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def _write(tmp_path, text):
    p = tmp_path / "log.clf"
    p.write_text(text)
    return str(p)


def test_flaser_golden(tmp_path):
    # 3 beams over pi: angles -pi/2, 0, +pi/2; ranges 2, 3, 4.
    # laser pose (1, 2, pi/2); odom pose differs (must be ignored).
    line = (
        "FLASER 3 2.0 3.0 4.0 "
        "1.0 2.0 1.5707963 9.0 9.0 9.0 100.0 host 100.0\n"
    )
    frames = read_carmen_log(_write(tmp_path, line))
    assert len(frames) == 1
    f = frames[0]
    # pose: theta radians -> degrees; laser pose, not odom
    np.testing.assert_allclose(f.odo_pose, [1.0, 2.0, 90.0], atol=1e-4)
    # sensor-frame points: beam0 at -90deg -> (0, -2); beam1 at 0 ->
    # (3, 0); beam2 at +90 -> (0, 4)
    np.testing.assert_allclose(
        f.scan_xy, [[0.0, -2.0], [3.0, 0.0], [0.0, 4.0]], atol=1e-5
    )


def test_flaser_out_of_range_masked(tmp_path):
    # 81.9 no-echo sentinel and near-zero ranges are dropped
    line = (
        "FLASER 5 81.90 3.0 0.0 0.01 4.0 "
        "0 0 0 0 0 0 1.0 host 1.0\n"
    )
    frames = read_carmen_log(_write(tmp_path, line))
    assert frames[0].scan_xy.shape == (2, 2)


def test_flaser_truncated_line_skipped(tmp_path):
    text = (
        "FLASER 5 1.0 2.0\n"   # truncated: skipped
        "ODOM 0 0 0 0 0 0 1.0 host 1.0\n"
        "FLASER 1 3.0 0 0 0 0 0 0 2.0 host 2.0\n"
    )
    frames = read_carmen_log(_write(tmp_path, text))
    assert len(frames) == 1
    # a 1-beam scan's only beam sits at the FOV start (-pi/2)
    np.testing.assert_allclose(frames[0].scan_xy, [[0.0, -3.0]], atol=1e-5)


def test_robotlaser1_golden(tmp_path):
    # explicit geometry header: start=-pi/2, fov=pi, res=pi/2, max=30
    line = (
        "ROBOTLASER1 0 -1.5707963 3.1415926 1.5707963 30.0 0.01 0 "
        "3 2.0 3.0 4.0 0 "
        "5.0 6.0 0.0 9.0 9.0 9.0 0 0 0 0 0 7.0 host 7.0\n"
    )
    frames = read_carmen_log(_write(tmp_path, line))
    assert len(frames) == 1
    f = frames[0]
    np.testing.assert_allclose(f.odo_pose, [5.0, 6.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(
        f.scan_xy, [[0.0, -2.0], [3.0, 0.0], [0.0, 4.0]], atol=1e-5
    )


def test_robotlaser1_sensor_cutoff_does_not_leak(tmp_path):
    # ROBOTLASER1 with max_range 3.5 masks its own 4.0 reading; the
    # following FLASER must still use the caller's cutoff (50).
    text = (
        "ROBOTLASER1 0 0.0 3.1415926 1.5707963 3.5 0.01 0 "
        "2 2.0 4.0 0 "
        "0 0 0 0 0 0 0 0 0 0 0 1.0 host 1.0\n"
        "FLASER 1 4.0 0 0 0 0 0 0 2.0 host 2.0\n"
    )
    frames = read_carmen_log(_write(tmp_path, text))
    assert frames[0].scan_xy.shape == (1, 2)   # 4.0 masked by sensor max
    assert frames[1].scan_xy.shape == (1, 2)   # 4.0 kept


def test_office_loop_fixture_parses():
    frames = read_carmen_log(os.path.join(DATA, "office_loop.clf"))
    gt = read_carmen_gt(os.path.join(DATA, "office_loop.gt"))
    assert len(frames) == 500
    assert gt.shape == (500, 3)
    for f in frames[:10]:
        assert f.scan_xy.ndim == 2 and f.scan_xy.shape[1] == 2
        assert f.scan_xy.shape[0] > 100        # indoor: most beams hit
        assert np.all(np.isfinite(f.scan_xy))
        assert np.all(np.hypot(*f.scan_xy.T) < 30.5)
    # odometry starts at ground truth and drifts measurably by the end
    odo = np.stack([f.odo_pose for f in frames])
    assert np.allclose(odo[0], gt[0], atol=1e-4)
    final_err = np.hypot(odo[-1, 0] - gt[-1, 0], odo[-1, 1] - gt[-1, 1])
    assert 0.5 < final_err < 10.0


def test_max_frames_cap():
    frames = read_carmen_log(
        os.path.join(DATA, "office_loop.clf"), max_frames=7
    )
    assert len(frames) == 7


def test_fixture_is_deterministic():
    """The committed fixture must match its generator (regeneration
    guard: anyone editing the generator must refresh the fixture)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_carmen_fixture",
        os.path.join(
            os.path.dirname(__file__), "..", "..", "cli",
            "make_carmen_fixture.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    lines, gt_lines = mod.generate(n_frames=5)
    with open(os.path.join(DATA, "office_loop.clf")) as f:
        f.readline()  # comment header
        committed = [f.readline().rstrip("\n") for _ in range(5)]
    assert committed == lines[:5]
