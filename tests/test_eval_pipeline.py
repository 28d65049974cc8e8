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

    # submission writer consumes the prediction dict directly
    path = tmp_path / "submission.csv"
    write_submission(str(path), predictions)
    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Id", "PredictionString"]
    assert len(rows) == 1 + len(predictions)
    for tok, pred_str in rows[1:]:
        assert len(parse_prediction_string(pred_str)) == len(predictions[tok])
