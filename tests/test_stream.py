"""SweepAccumulator (data/stream.py): the online accumulator must rebuild
EXACTLY the cloud the offline chain walk (LyftDataset.load_sweeps)
produces for each keyframe — same transforms, same dt channel, same
newest-first order."""

import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.fixture import build_fixture
from tpu_pillars.data.lyft import LyftDataset
from tpu_pillars.data.stream import SweepAccumulator
from tpu_pillars.geometry.transforms import Pose

CFG = tiny_config()


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream") / "lyft"
    json_dir = build_fixture(str(root), CFG, num_scenes=1,
                             samples_per_scene=3, sweeps_per_sample=3,
                             seed=11)
    return LyftDataset(json_dir)


def _lidar_records_in_time_order(ds):
    recs = [sd for sd in ds.tables["sample_data"].values()]
    recs.sort(key=lambda sd: sd["timestamp"])
    return recs


def test_streaming_parity_with_load_sweeps(ds):
    acc = SweepAccumulator(num_sweeps=3)
    checked = 0
    for sd in _lidar_records_in_time_order(ds):
        cloud = acc.push(ds.load_point_cloud(sd), ds.lidar_to_global(sd),
                         sd["timestamp"])
        if sd.get("is_key_frame"):
            want = ds.load_sweeps(sd["sample_token"], 3)
            np.testing.assert_array_equal(cloud, want)
            checked += 1
    assert checked == 3          # every keyframe verified


def test_reset_and_capacity():
    rng = np.random.default_rng(0)
    acc = SweepAccumulator(num_sweeps=2)
    p1 = rng.normal(0, 10, (50, 4)).astype(np.float32)
    p2 = rng.normal(0, 10, (60, 4)).astype(np.float32)
    p3 = rng.normal(0, 10, (70, 4)).astype(np.float32)
    ident = Pose.identity()
    acc.push(p1, ident, 0.0)
    acc.push(p2, ident, 1e5)
    out = acc.push(p3, ident, 2e5)      # p1 evicted (capacity 2)
    assert len(out) == 130
    # newest first; dt of the newest sweep is 0, previous 0.1 s
    np.testing.assert_allclose(out[:70, 4], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[70:, 4], 0.1, atol=1e-7)
    acc.reset()
    assert len(acc) == 0
    out = acc.push(p1, ident, 3e5)
    assert len(out) == 50 and np.allclose(out[:, 4], 0.0)


def test_identity_pose_passthrough():
    """With identity poses, xyz+features pass through and only dt is
    appended — the degenerate single-sweep case."""
    rng = np.random.default_rng(1)
    acc = SweepAccumulator(num_sweeps=1)
    pts = rng.normal(0, 5, (40, 5)).astype(np.float32)
    out = acc.push(pts, Pose.identity(), 42.0)
    np.testing.assert_allclose(out[:, :5], pts, atol=1e-6)
    np.testing.assert_array_equal(out[:, 5], np.zeros(40))


def test_bad_inputs():
    acc = SweepAccumulator(num_sweeps=2)
    with pytest.raises(ValueError):
        acc.push(np.zeros((5, 2), np.float32), Pose.identity(), 0.0)
    with pytest.raises(ValueError):
        SweepAccumulator(num_sweeps=0)
