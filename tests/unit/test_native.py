"""Parity of the native C++ host runtime (csrc/libndtslam.so) with the
pure-Python implementations. Skips when the toolchain can't build."""

import numpy as np
import pytest

from ndt_slam_tpu.io import native
from ndt_slam_tpu.io.pcd import load_pcd
from ndt_slam_tpu.io.tsukuba import (
    LogFrame, read_tsukuba_log, write_tsukuba_log,
)
from ndt_slam_tpu.pre.resample import resample_points_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_resample_parity():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(2, 400))
        xy = np.cumsum(rng.normal(0, 0.08, (n, 2)), 0).astype(np.float32)
        a = resample_points_np(xy)
        b = native.resample_points(xy)
        assert a.shape == b.shape, trial
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_tsukuba_parser_parity(tmp_path):
    rng = np.random.default_rng(1)
    frames = [
        LogFrame(
            stamp=i,
            odo_pose=np.array([i * 0.1, -i * 0.05, i * 2.0], np.float32),
            scan_xy=rng.normal(0, 3, (int(rng.integers(5, 50)), 2)).astype(
                np.float32
            ),
        )
        for i in range(7)
    ]
    path = str(tmp_path / "log.txt")
    write_tsukuba_log(path, frames)
    py = read_tsukuba_log(path)
    nat = native.read_tsukuba_log(path)
    assert len(py) == len(nat) == 7
    for a, b in zip(py, nat):
        assert a.stamp == b.stamp
        np.testing.assert_allclose(a.odo_pose, b.odo_pose, atol=1e-5)
        assert a.scan_xy.shape == b.scan_xy.shape
        np.testing.assert_allclose(a.scan_xy, b.scan_xy, atol=1e-5)


def test_pcd_writer_parity(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.normal(0, 2, (123, 2)).astype(np.float32)
    path = str(tmp_path / "out.pcd")
    assert native.save_pcd(path, pts)
    back = load_pcd(path)
    assert back.shape == (123, 2)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_native_carmen_parity():
    """Native CARMEN parser must match io/carmen.py frame-for-frame on
    the committed 500-frame fixture (poses bit-equal, points bit-equal,
    same max_frames semantics)."""
    import os

    from ndt_slam_tpu.io import native
    from ndt_slam_tpu.io.carmen import read_carmen_log

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    path = os.path.join(
        os.path.dirname(__file__), "..", "data", "office_loop.clf"
    )
    for max_frames in (None, 37):
        py = read_carmen_log(path, max_frames=max_frames)
        nt = native.read_carmen_log(path, max_frames=max_frames)
        assert nt is not None
        assert len(nt) == len(py)
        for a, b in zip(nt, py):
            assert a.stamp == b.stamp
            np.testing.assert_array_equal(a.odo_pose, b.odo_pose)
            np.testing.assert_array_equal(a.scan_xy, b.scan_xy)


def test_native_carmen_robotlaser_parity(tmp_path):
    """ROBOTLASER1 lines parse identically in both implementations."""
    from ndt_slam_tpu.io import native
    from ndt_slam_tpu.io.carmen import read_carmen_log

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    line = (
        "ROBOTLASER1 0 -1.5707963 3.14159265 0.0174532925 30.0 0.01 0 5 "
        "2.5 3.1 29.99 0.04 12.2 0 "
        "1.25 -0.5 0.7853981 1.2 -0.45 0.78 0.1 0.02 0.5 0.3 0.2 "
        "1203.4 host 1203.5\n"
    )
    p = tmp_path / "rl.clf"
    p.write_text("# comment line\n" + line + line)
    py = read_carmen_log(str(p))
    nt = native.read_carmen_log(str(p))
    assert len(py) == len(nt) == 2
    for a, b in zip(nt, py):
        np.testing.assert_array_equal(a.odo_pose, b.odo_pose)
        np.testing.assert_array_equal(a.scan_xy, b.scan_xy)
