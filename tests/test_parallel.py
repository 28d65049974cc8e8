"""shard_map DP eval on the fake 8-device mesh (BASELINE config #5;
SURVEY.md section 4 'Distributed')."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.detector import Detector
from tpu_pillars.models import PointPillars
from tpu_pillars.ops.voxelize import PillarBatch
from tpu_pillars.parallel import make_dp_detector_fn, make_mesh

CFG = tiny_config()


def _init_variables(cfg):
    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    return model.init(jax.random.PRNGKey(7), dummy)


def test_dp_eval_matches_per_sweep_predict(rng):
    cfg = CFG
    mesh = make_mesh()
    assert mesh.devices.size == 8

    variables = _init_variables(cfg)
    det = Detector(cfg, variables)
    dp_fn = make_dp_detector_fn(cfg, mesh)

    B = 16  # 2 sweeps per device
    scenes = [make_scene(rng, cfg, num_objects=3, clutter=400)
              for _ in range(B)]
    padded, counts = zip(*[det.pad_points(s.points) for s in scenes])
    pts = np.stack(padded)
    n = np.asarray(counts)

    out = dp_fn(variables, pts, n)
    assert out.boxes.shape == (B, cfg.max_detections, 7)

    for i in (0, 5, 11, 15):  # spot-check shards from different devices
        single = det.predict_raw(scenes[i].points)
        np.testing.assert_array_equal(np.asarray(out.valid[i]),
                                      np.asarray(single.valid))
        np.testing.assert_allclose(np.asarray(out.boxes[i]),
                                   np.asarray(single.boxes), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.scores[i]),
                                   np.asarray(single.scores), atol=1e-6)
