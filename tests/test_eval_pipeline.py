"""End-to-end evaluation wiring over the on-disk Lyft-format fixture:
dataset -> detector -> global-frame EvalBoxes -> Lyft mAP -> submission CSV
(SURVEY.md 3.3 + 3.4)."""

import csv

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.fixture import build_fixture
from tpu_pillars.data.lyft import LyftDataset
from tpu_pillars.data.submission import parse_prediction_string, write_submission
from tpu_pillars.detector import Detector
from tpu_pillars.evaluation.pipeline import evaluate_dataset
from tpu_pillars.models import PointPillars
from tpu_pillars.ops.voxelize import PillarBatch

CFG = tiny_config()


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("lyft_eval_fixture")
    json_dir = build_fixture(str(root), CFG, num_scenes=1,
                             samples_per_scene=2, sweeps_per_sample=1)
    return LyftDataset(json_dir)


@pytest.fixture(scope="module")
def detector():
    model = PointPillars(CFG)
    dummy = PillarBatch(
        jnp.zeros((CFG.max_pillars, CFG.max_points_per_pillar,
                   CFG.num_decorated_features)),
        jnp.zeros((CFG.max_pillars, CFG.max_points_per_pillar), bool),
        jnp.zeros((CFG.max_pillars, 2), jnp.int32),
        jnp.zeros((CFG.max_pillars,), bool),
    )
    return Detector(CFG, model.init(jax.random.PRNGKey(0), dummy))


def test_evaluate_dataset_runs_end_to_end(dataset, detector, tmp_path):
    mAP, table, predictions = evaluate_dataset(detector, dataset)
    assert 0.0 <= mAP <= 1.0
    assert set(predictions) == set(dataset.sample_tokens())
    assert len(table) == 10  # IoU 0.5 .. 0.95

    # predictions are in the GLOBAL frame: fixture ego sits near (120, 300),
    # so any predicted box center must be near there, not near the origin
    boxes = [b for bs in predictions.values() for b in bs]
    if boxes:
        centers = np.stack([b.center for b in boxes])
        assert np.all(np.abs(centers[:, 0] - 120) < 150)
        assert np.all(np.abs(centers[:, 1] - 300) < 150)

    # batched path == per-token path: the same boxes, sample by sample
    for tok in dataset.sample_tokens():
        sd = dataset.lidar_sample_data(tok)
        pts = dataset.load_point_cloud(sd)[:, : CFG.num_raw_features]
        l2g = dataset.lidar_to_global(sd)
        single = detector.predict(pts, token=tok, lidar_to_global=l2g)
        batched = predictions[tok]
        assert len(single) == len(batched)
        for a, b in zip(single, batched):
            np.testing.assert_allclose(a.center, b.center, atol=1e-5)
            np.testing.assert_allclose(a.wlh, b.wlh, atol=1e-5)
            assert a.label == b.label

    # submission writer consumes the prediction dict directly
    path = tmp_path / "submission.csv"
    write_submission(str(path), predictions)
    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Id", "PredictionString"]
    assert len(rows) == 1 + len(predictions)
    for tok, pred_str in rows[1:]:
        assert len(parse_prediction_string(pred_str)) == len(predictions[tok])


@pytest.mark.slow
def test_evaluate_dataset_on_mesh_matches_single_chip(dataset, detector):
    """BASELINE config #5 end-to-end: sharded sweeps, gathered mAP — one
    call over the fake 8-device mesh, identical to the single-chip path."""
    from tpu_pillars.parallel import make_mesh

    mAP1, table1, preds1 = evaluate_dataset(detector, dataset, batch_size=2)
    mesh = make_mesh(jax.devices("cpu")[:8])
    mAP8, table8, preds8 = evaluate_dataset(detector, dataset, mesh=mesh)

    assert mAP8 == pytest.approx(mAP1, abs=1e-9)
    assert set(preds8) == set(preds1)
    for tok in preds1:
        assert len(preds8[tok]) == len(preds1[tok])
        for a, b in zip(preds1[tok], preds8[tok]):
            np.testing.assert_allclose(a.center, b.center, atol=1e-5)
            np.testing.assert_allclose(a.wlh, b.wlh, atol=1e-5)
            assert a.label == b.label
            assert a.score == pytest.approx(b.score, abs=1e-5)


@pytest.mark.slow
def test_eval_cli_end_to_end(dataset, tmp_path):
    """python -m tpu_pillars.evaluation.cli: checkpoint -> mAP + metrics
    JSON + submission CSV, all through the subprocess surface."""
    import json
    import os
    import subprocess
    import sys

    from tpu_pillars.train import TrainConfig, create_train_state
    from tpu_pillars.train.checkpoint import save_checkpoint

    state = create_train_state(CFG, TrainConfig(batch_size=2, max_gt_boxes=8,
                                                total_steps=10))
    ckpt = str(tmp_path / "ck.msgpack")
    save_checkpoint(ckpt, state, config=CFG)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = str(tmp_path / "metrics.json")
    sub_csv = str(tmp_path / "submission.csv")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "tpu_pillars.evaluation.cli",
         "--data", dataset.json_path, "--ckpt", ckpt,
         "--platform", "cpu",
         "--out", out_json, "--submission", sub_csv, "--batch", "2"],
        env=env, cwd=repo, capture_output=True, timeout=900)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    assert "Lyft mAP(0.5:0.95)" in proc.stdout.decode()

    with open(out_json) as f:
        metrics = json.load(f)
    assert 0.0 <= metrics["mAP"] <= 1.0
    assert metrics["num_samples"] == len(list(dataset.sample_tokens()))
    assert len(metrics["ap"]) == 10

    with open(sub_csv) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Id", "PredictionString"]
    assert len(rows) == 1 + metrics["num_samples"]
    for _tok, pred in rows[1:]:
        parse_prediction_string(pred)  # must round-trip


def test_evaluate_dataset_protocol_rule_plumbing(dataset, detector):
    """match_rule/tie_order (docs/MAP_PROTOCOL.md rows 6-7) thread through
    evaluate_dataset to the scorer: the alternate rules run end-to-end and
    can only lower (argmax_check) or perturb ties (tie order) relative to
    the defaults — and with identical predictions, deltas stay tiny."""
    m_def, t_def, preds = evaluate_dataset(detector, dataset)
    m_chk, _t, preds2 = evaluate_dataset(detector, dataset,
                                         match_rule="argmax_check",
                                         tie_order="numpy")
    # same detector, same sweeps -> identical predictions either way
    for tok in preds:
        assert len(preds[tok]) == len(preds2[tok])
    # mask_argmax can only convert FPs to TPs relative to argmax_check
    assert m_def >= m_chk - 1e-12
