"""Lyft dataset adapter + fixture + submission writer tests
(SURVEY.md L0 / 3.4 / section 4 'Fixtures')."""

import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.fixture import build_fixture
from tpu_pillars.data.lyft import LyftDataset
from tpu_pillars.data.submission import (
    parse_prediction_string, prediction_string, write_submission,
)
from tpu_pillars.geometry.boxes import Box3D

CFG = tiny_config()


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("lyft_fixture")
    json_dir = build_fixture(str(root), CFG, num_scenes=2,
                             samples_per_scene=3, sweeps_per_sample=2)
    return LyftDataset(json_dir)


def test_navigation(dataset):
    toks = dataset.sample_tokens()
    assert len(toks) == 6
    scene0 = dataset.scene_list[0]["token"]
    assert len(dataset.sample_tokens(scene0)) == 3
    # temporal chaining intact
    s = dataset.get("sample", toks[0])
    assert s["next"] == toks[1]


def test_load_point_cloud(dataset):
    sd = dataset.lidar_sample_data(dataset.sample_tokens()[0])
    pts = dataset.load_point_cloud(sd)
    assert pts.ndim == 2 and pts.shape[1] == 5
    assert pts.dtype == np.float32
    assert len(pts) > 1000


def test_boxes_lidar_frame_roundtrip(dataset):
    tok = dataset.sample_tokens()[0]
    glob = dataset.get_boxes_global(tok)
    lidar = dataset.get_boxes_lidar(tok)
    assert len(glob) == len(lidar) > 0
    sd = dataset.lidar_sample_data(tok)
    l2g = dataset.lidar_to_global(sd)
    for g, l in zip(glob, lidar):
        back = l.transformed(l2g.rotation, l2g.translation)
        np.testing.assert_allclose(back.center, g.center, atol=1e-9)
        assert abs((back.yaw - g.yaw + np.pi) % (2 * np.pi) - np.pi) < 1e-9
        assert l.label == g.label


def test_boxes_land_inside_detection_range(dataset):
    """The fixture's GT in the lidar frame must sit inside the configured
    detection range (it was authored there)."""
    tok = dataset.sample_tokens()[0]
    for b in dataset.get_boxes_lidar(tok):
        assert CFG.x_min < b.center[0] < CFG.x_max
        assert CFG.y_min < b.center[1] < CFG.y_max


def test_multi_sweep_accumulation(dataset):
    tok = dataset.sample_tokens()[1]
    single = dataset.load_point_cloud(dataset.lidar_sample_data(tok))
    multi = dataset.load_sweeps(tok, num_sweeps=2)
    assert multi.shape[1] == 6  # + dt channel
    assert len(multi) == 2 * len(single)
    # keyframe half: dt == 0
    np.testing.assert_allclose(multi[: len(single), 5], 0.0)
    # older sweep: dt ~ 0.1 s
    assert multi[len(single):, 5].mean() == pytest.approx(0.1, abs=1e-6)
    # static world: transformed old sweep must align with keyframe points
    # (same generation order, 0.02 m jitter)
    d = np.linalg.norm(multi[len(single):, :3] - multi[: len(single), :3], axis=1)
    assert np.median(d) < 0.1


def test_load_sweeps_padded_matches_python_path(dataset):
    """Native fused load (crop during read) == python load_sweeps + crop."""
    cfg = CFG.replace(num_sweeps=2, max_points=16384)
    tok = dataset.sample_tokens()[1]

    padded, n = dataset.load_sweeps_padded(tok, cfg)
    assert padded.shape == (cfg.max_points, 5)  # x,y,z,i,dt

    cloud = dataset.load_sweeps(tok, num_sweeps=2)        # (N, 6) with ring
    ref = np.concatenate([cloud[:, :4], cloud[:, 5:6]], axis=1)
    m = ((ref[:, 0] >= cfg.x_min) & (ref[:, 0] < cfg.x_max)
         & (ref[:, 1] >= cfg.y_min) & (ref[:, 1] < cfg.y_max)
         & (ref[:, 2] >= cfg.z_min) & (ref[:, 2] <= cfg.z_max))
    ref = ref[m]
    assert int(n) == len(ref)
    np.testing.assert_allclose(padded[: int(n)], ref, atol=1e-4)


def test_submission_roundtrip(tmp_path):
    boxes = [
        Box3D(center=[1, 2, 3], wlh=[1.9, 4.7, 1.7], yaw=0.5,
              label="car", score=0.91),
        Box3D(center=[-5, 0, 1], wlh=[0.8, 0.8, 1.8], yaw=-1.2,
              label="pedestrian", score=0.33),
    ]
    s = prediction_string(boxes)
    parsed = parse_prediction_string(s)
    assert len(parsed) == 2
    np.testing.assert_allclose(parsed[0].center, boxes[0].center, atol=1e-4)
    assert parsed[0].label == "car"
    assert parsed[1].score == pytest.approx(0.33, abs=1e-4)

    path = tmp_path / "sub.csv"
    write_submission(str(path), {"tokA": boxes, "tokB": []})
    lines = path.read_text().strip().splitlines()
    assert lines[0] == "Id,PredictionString"
    assert lines[1].startswith("tokA,0.9100 ")
    assert lines[2] == "tokB,"
