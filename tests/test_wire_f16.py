"""float16 wire-format option: halves the host->device upload; detections
must stay within the quantization bound of f32 results."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.detector import Detector
from tpu_pillars.models import PointPillars
from tpu_pillars.ops.voxelize import PillarBatch

CFG = tiny_config()


def _variables(cfg):
    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    return model.init(jax.random.PRNGKey(5), dummy)


def test_f16_wire_detections_close(rng):
    cfg = CFG
    variables = _variables(cfg)
    det32 = Detector(cfg, variables)
    det16 = Detector(cfg, variables, wire_dtype=jnp.float16)

    scene = make_scene(rng, cfg, num_objects=5, clutter=800)
    padded16, n = det16.pad_points(scene.points)
    assert padded16.dtype == np.float16
    assert np.isfinite(padded16).all()

    # logit-level comparison (final box ordering is chaotic under tiny input
    # perturbations when weights are untrained — scores all hover at 0.5)
    padded32, n32 = det32.pad_points(scene.points)
    c32, b32, _ = det32._model(variables, jnp.asarray(padded32), n32)
    c16, b16, _ = det16._model(variables, jnp.asarray(padded16), n)
    dc = np.abs(np.asarray(c32) - np.asarray(c16))
    assert np.median(dc) < 1e-3
    # quantization can hop boundary points across pillar cells — discrete,
    # local logit changes; require them to stay rare (~2% with random
    # untrained weights on this scene)
    assert np.mean(dc > 0.1) < 0.05

    # end-to-end path runs and produces finite boxes
    out16 = det16.predict(scene.points)
    assert isinstance(out16, list) and len(out16) > 0
    for b in out16:
        assert np.isfinite(b.to_array()).all()
