"""Native C++ loader vs the NumPy fallback: identical semantics, plus a
correctness check against the pure-python dataset path."""

import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data import native_io

CFG = tiny_config(max_points=2048)


@pytest.fixture(scope="module")
def bin_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    n = 3000
    pts = np.zeros((n, 5), np.float32)
    pts[:, 0] = rng.uniform(CFG.x_min - 10, CFG.x_max + 10, n)
    pts[:, 1] = rng.uniform(CFG.y_min - 10, CFG.y_max + 10, n)
    pts[:, 2] = rng.uniform(CFG.z_min - 2, CFG.z_max + 2, n)
    pts[:, 3] = rng.uniform(0, 255, n)
    pts[:, 4] = rng.integers(0, 64, n)
    path = tmp_path_factory.mktemp("bins") / "sweep.bin"
    pts.tofile(str(path))
    return str(path), pts


def test_native_compiles():
    assert native_io.native_available(), "g++ build of pointcloud.cc failed"


def test_native_matches_numpy_fallback(bin_file):
    path, _ = bin_file
    out_n, n_n = native_io.load_points_padded(path, CFG, use_native=True)
    out_p, n_p = native_io.load_points_padded(path, CFG, use_native=False)
    assert n_n == n_p > 0
    np.testing.assert_array_equal(out_n, out_p)


def test_crop_semantics(bin_file):
    path, raw = bin_file
    out, n = native_io.load_points_padded(path, CFG)
    kept = out[:n]
    assert np.all(kept[:, 0] >= CFG.x_min) and np.all(kept[:, 0] < CFG.x_max)
    assert np.all(kept[:, 2] >= CFG.z_min) and np.all(kept[:, 2] <= CFG.z_max)
    # count matches a direct numpy crop
    m = ((raw[:, 0] >= CFG.x_min) & (raw[:, 0] < CFG.x_max)
         & (raw[:, 1] >= CFG.y_min) & (raw[:, 1] < CFG.y_max)
         & (raw[:, 2] >= CFG.z_min) & (raw[:, 2] <= CFG.z_max))
    assert n == min(m.sum(), CFG.max_points)
    # padding intact
    assert np.all(out[n:] == 1e6)


def test_multisweep_native_matches_fallback(bin_file, tmp_path):
    path, _ = bin_file
    # two sweeps: identity keyframe + a rotated/translated previous sweep
    th = 0.2
    rt0 = np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    rt1 = np.hstack([R, np.array([[1.0], [-0.5], [0.1]], np.float32)])
    args = ([path, path], [rt0, rt1], [0.0, 0.1])
    out_n, n_n = native_io.load_sweeps_padded(*args, CFG, use_native=True)
    out_p, n_p = native_io.load_sweeps_padded(*args, CFG, use_native=False)
    assert n_n == n_p > 0
    np.testing.assert_allclose(out_n, out_p, atol=1e-5)
    kept = out_n[:n_n]
    assert set(np.unique(kept[:, 4])) == {np.float32(0.0), np.float32(0.1)}
