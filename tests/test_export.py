"""jax.export deployment artifacts (tpu_pillars/export.py): serialized
StableHLO stages round-trip through disk and reproduce the live Detector's
packed detections bit-for-bit on the same weights."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.detector import Detector
from tpu_pillars.export import (
    ExportedDetector, config_from_dict, config_to_dict, export_inference,
    load_inference,
)
from tpu_pillars.models import PointPillars
from tpu_pillars.ops.voxelize import PillarBatch


def _variables(cfg):
    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    return model.init(jax.random.PRNGKey(0), dummy)


def test_config_dict_roundtrip():
    cfg = tiny_config(num_sweeps=3)
    assert config_from_dict(config_to_dict(cfg)) == cfg


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = tiny_config()
    variables = _variables(cfg)
    path = str(tmp_path_factory.mktemp("export") / "detector")
    manifest = export_inference(cfg, variables, path, batch_sizes=(1, 2))
    return cfg, variables, path, manifest


def test_export_writes_self_contained_artifact(artifact):
    cfg, _, path, manifest = artifact
    files = set(os.listdir(path))
    assert {"manifest.json", "model_b1.bin", "post_b1.bin",
            "model_b2.bin", "post_b2.bin"} <= files
    with open(os.path.join(path, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk["batch_sizes"] == [1, 2]
    assert config_from_dict(on_disk["config"]) == cfg
    # weights are baked in: the model stage must outweigh the parameters
    n_param_bytes = 4 * sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(
            artifact[1]["params"]))
    assert os.path.getsize(os.path.join(path, "model_b1.bin")) \
        > 0.5 * n_param_bytes


@pytest.mark.slow
def test_exported_matches_live_detector_bitwise(artifact):
    cfg, variables, path, _ = artifact
    det = Detector(cfg, variables)
    exp = load_inference(path)
    assert isinstance(exp, ExportedDetector)
    rng = np.random.default_rng(0)
    scenes = [make_scene(rng, cfg, num_objects=5, points_per_object=100,
                         clutter=700) for _ in range(2)]
    pads = [exp.pad_points(s.points) for s in scenes]
    pts_b = np.stack([p for p, _ in pads])
    n_b = np.asarray([n for _, n in pads], np.int32)

    got = np.asarray(exp.predict_packed_batch(pts_b, n_b))
    ref = np.asarray(det.predict_packed_batch(jnp.asarray(pts_b),
                                              jnp.asarray(n_b)))
    np.testing.assert_array_equal(got, ref)

    # the Box3D surface agrees too (batch-1 stage)
    boxes_e = exp.predict(scenes[0].points)
    boxes_d = det.predict(scenes[0].points)
    assert len(boxes_e) == len(boxes_d)
    for be, bd in zip(boxes_e, boxes_d):
        assert be.label == bd.label
        np.testing.assert_array_equal(be.center, bd.center)


def test_exported_rejects_wrong_batch(artifact):
    _, _, path, _ = artifact
    exp = load_inference(path)
    with pytest.raises(ValueError, match="batch 3"):
        exp.predict_packed_batch(
            np.zeros((3, exp.config.max_points,
                      exp.config.num_input_features), np.float32),
            np.zeros((3,), np.int32))


def test_export_cli_from_checkpoint(artifact, tmp_path, monkeypatch):
    """python -m tpu_pillars.export --ckpt ... --out ... round-trips
    (tiny preset, in-process main)."""
    import io
    from contextlib import redirect_stdout

    from tpu_pillars import export as export_mod
    from tpu_pillars.train.checkpoint import export_inference_checkpoint
    from tpu_pillars.train.state import TrainState

    cfg, variables, _, _ = artifact
    state = TrainState(step=0, params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=(), tx=None)
    ckpt = str(tmp_path / "ck.msgpack")
    export_inference_checkpoint(ckpt, state, config=cfg)
    out_dir = str(tmp_path / "artifact")
    buf = io.StringIO()
    monkeypatch.setitem(export_mod.__dict__, "_preset",
                        lambda name: cfg)   # tiny fixture config
    with redirect_stdout(buf):
        export_mod.main(["--ckpt", ckpt, "--out", out_dir,
                         "--preset", "tiny", "--batch-sizes", "1"])
    assert json.loads(buf.getvalue())["batch_sizes"] == [1]
    exp = load_inference(out_dir)
    rng = np.random.default_rng(2)
    scene = make_scene(rng, cfg, num_objects=3, points_per_object=60,
                       clutter=300)
    det = Detector(cfg, variables)
    be, bd = exp.predict(scene.points), det.predict(scene.points)
    assert [b.label for b in be] == [b.label for b in bd]


def test_exported_degenerate_inputs(artifact):
    """Empty and overflowing clouds go through the artifact's pad/predict
    surface without error (the documented first-N overflow policy)."""
    cfg, _, path, _ = artifact
    exp = load_inference(path)
    boxes = exp.predict(np.zeros((0, cfg.num_input_features), np.float32))
    assert isinstance(boxes, list)
    rng = np.random.default_rng(1)
    too_many = rng.uniform(-20, 20,
                           (cfg.max_points + 500,
                            cfg.num_input_features)).astype(np.float32)
    pts, n = exp.pad_points(too_many)
    assert pts.shape == (cfg.max_points, cfg.num_input_features)
    assert int(n) == cfg.max_points
    exp.predict(too_many)
