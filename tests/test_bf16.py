"""bf16 compute-dtype inference path (params stay f32; convs/PFN compute in
bfloat16 — the MXU-native dtype). Fidelity is bounded, not bit-exact."""

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
    return model.init(jax.random.PRNGKey(11), dummy)


def test_bf16_logits_close_to_f32(rng):
    cfg = CFG
    variables = _variables(cfg)
    det32 = Detector(cfg, variables)
    det16 = Detector(cfg, variables, dtype=jnp.bfloat16)
    scene = make_scene(rng, cfg, num_objects=5, clutter=800)
    padded, n = det32.pad_points(scene.points)

    c32, b32, d32 = det32._model(variables, jnp.asarray(padded), n)
    c16, b16, d16 = det16._model(variables, jnp.asarray(padded), n)
    assert c16.dtype == jnp.float32  # cast back at the stage boundary
    dc = np.abs(np.asarray(c32) - np.asarray(c16))
    db = np.abs(np.asarray(b32) - np.asarray(b16))
    assert np.median(dc) < 0.02, np.median(dc)
    assert np.quantile(db, 0.99) < 0.1

    # end-to-end still produces a sane detection list
    out = det16.predict(scene.points)
    assert isinstance(out, list)
    for b in out:
        assert np.isfinite(b.to_array()).all()
