"""Integration: train on synthetic scenes until the detector recovers the
planted boxes (SURVEY.md section 4 'Integration': 'train few steps, assert
loss down and the detector recovers planted boxes')."""

import jax
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
from tpu_pillars.detector import Detector
from tpu_pillars.evaluation.map_eval import EvalBox, lyft_map
from tpu_pillars.train import TrainBatch, TrainConfig, create_train_state, make_train_step
from tpu_pillars.train.loop import fit
from tpu_pillars.utils.logging import JsonlLogger


@pytest.mark.slow
def test_overfit_two_scenes_recovers_boxes(rng, tmp_path):
    cfg = tiny_config()
    # 400 steps, not 300: at 300 this seed sits on the pass/fail knife edge
    # (car AP@0.3 swings 0.37-0.52 under f32 reduction-order changes — one
    # matched box of 6 GT flips it); at 400 the detector recovers every
    # planted box (AP 1.0, stable through 600 — measured 2026-08-19)
    tcfg = TrainConfig(learning_rate=2e-3, total_steps=400, batch_size=2,
                       max_gt_boxes=8)
    state = create_train_state(cfg, tcfg)

    scenes = [make_scene(rng, cfg, num_objects=3, points_per_object=200,
                         clutter=300, class_subset=[0]) for _ in range(2)]
    batch = TrainBatch(*scenes_to_train_batch(scenes, cfg, tcfg.max_gt_boxes))

    logger = JsonlLogger(str(tmp_path / "train.jsonl"))
    state = fit(state, iter(lambda: batch, None), steps=400, config=cfg,
                logger=logger, log_every=100,
                ckpt_path=str(tmp_path / "ckpt.msgpack"))

    det = Detector(cfg, state.variables)
    gt, preds = [], []
    for i, scene in enumerate(scenes):
        tok = f"s{i}"
        for b, c in zip(scene.gt_boxes, scene.gt_classes):
            gt.append(EvalBox(tok, cfg.class_names[c], np.asarray(b, np.float64)))
        for box in det.predict(scene.points, token=tok):
            preds.append(EvalBox.from_box3d(box))

    mAP, table = lyft_map(gt, preds, cfg.class_names,
                          iou_thresholds=(0.3, 0.5))
    # overfit on 2 scenes: the detector must at least find the planted cars
    # at a loose IoU threshold
    car_ap_03 = table[0.3][0]
    assert car_ap_03 > 0.5, (mAP, table)
    # checkpoint was written
    assert (tmp_path / "ckpt.msgpack").exists()
