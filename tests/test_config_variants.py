"""Config-variant smoke tests: non-default grids/budgets must pillarize,
forward, and postprocess without shape errors (everything static flows from
PillarsConfig)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.detector import Detector
from tpu_pillars.models import PointPillars
from tpu_pillars.ops.voxelize import PillarBatch


VARIANTS = {
    # truly rectangular BEV canvas (H=64, W=128) — exercises H != W through
    # the conv pyramid, head reshape, and anchor layout
    "rect_grid": dict(x_min=-32.0, x_max=32.0, y_min=-16.0, y_max=16.0,
                      voxel_x=0.5, voxel_y=0.5),
    "coarse_voxels": dict(voxel_x=1.0, voxel_y=1.0, max_points_per_pillar=48),
    "small_budget": dict(max_pillars=128, pre_nms_top_k=64, max_detections=32),
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variant_end_to_end(rng, name):
    cfg = tiny_config(**VARIANTS[name])
    cfg.validate()
    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    variables = model.init(jax.random.PRNGKey(0), dummy)
    det = Detector(cfg, variables)
    scene = make_scene(rng, cfg, num_objects=3, clutter=400)
    boxes = det.predict(scene.points)
    assert isinstance(boxes, list)
    for b in boxes:
        assert np.isfinite(b.to_array()).all()
        assert cfg.x_min - 20 < b.center[0] < cfg.x_max + 20


@pytest.mark.slow
def test_car_only_config_end_to_end(rng):
    """BASELINE config #2: car-class-only anchors — 2 anchors/loc instead
    of 18; detect + train step both run, and every detection is a car."""
    from tpu_pillars.config import car_only_config
    from tpu_pillars.data.synthetic import scenes_to_train_batch
    from tpu_pillars.train import (
        TrainBatch, TrainConfig, create_train_state, make_train_step,
    )

    cfg = car_only_config(
        x_min=-20.0, x_max=20.0, y_min=-20.0, y_max=20.0,
        voxel_x=0.5, voxel_y=0.5,
        max_pillars=512, max_points_per_pillar=16, max_points=4096,
        pfn_channels=32, rpn_channels=(32, 64, 128), rpn_layers=(2, 2, 2),
        rpn_up_channels=32, pre_nms_top_k=128, max_detections=64)
    cfg.validate()
    assert cfg.num_classes == 1 and cfg.anchors_per_loc == 2

    scenes = [make_scene(rng, cfg, num_objects=4, points_per_object=80,
                         clutter=300) for _ in range(2)]
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=8, total_steps=5)
    batch = TrainBatch(*scenes_to_train_batch(scenes, cfg, 8))
    state = create_train_state(cfg, tcfg)
    step = jax.jit(make_train_step(cfg))
    state, losses = step(state, batch)
    assert np.isfinite(float(losses.total))

    det = Detector(cfg, {"params": state.params,
                         "batch_stats": state.batch_stats})
    boxes = det.predict(scenes[0].points)
    assert all(b.label == "car" for b in boxes)
