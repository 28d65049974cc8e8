"""Lyft mAP protocol tests with hand-computed expectations
(SURVEY.md section 7 hard part (c): exact protocol reproduction)."""

import numpy as np
import pytest

from tpu_pillars.evaluation.map_eval import (
    EvalBox, get_average_precisions, iou_3d_np, lyft_map,
)

CLASSES = ("car", "pedestrian")


def _box(x=0.0, y=0.0, z=0.0, w=2.0, l=4.0, h=1.5, yaw=0.0):
    return np.array([x, y, z, w, l, h, yaw], dtype=np.float64)


def test_iou3d_np_identity_and_offset():
    b = _box()[None]
    assert iou_3d_np(b, b)[0, 0] == pytest.approx(1.0, abs=1e-9)
    # shift by half the length: bev inter = 2x2=4 of 8 -> union 12; z full
    b2 = _box(x=2.0)[None]
    assert iou_3d_np(b, b2)[0, 0] == pytest.approx(4.0 / 12.0, abs=1e-9)


def test_perfect_predictions_map_one():
    gt, preds = [], []
    for i, tok in enumerate(["s0", "s1"]):
        for j in range(3):
            b = _box(x=10.0 * j, y=5.0 * i)
            gt.append(EvalBox(tok, "car", b))
            preds.append(EvalBox(tok, "car", b.copy(), score=0.9 - 0.1 * j))
    mAP, table = lyft_map(gt, preds, CLASSES)
    assert mAP == pytest.approx(1.0)
    # pedestrian has no GT -> NaN, excluded from the mean
    assert np.isnan(table[0.5][1])


def test_duplicate_detection_is_fp():
    b = _box()
    gt = [EvalBox("s0", "car", b)]
    preds = [EvalBox("s0", "car", b.copy(), score=0.9),
             EvalBox("s0", "car", b.copy(), score=0.8)]  # duplicate
    aps = get_average_precisions(gt, preds, CLASSES, 0.5)
    # PR: tp at rank1 (P=1, R=1), fp at rank2 -> AP = 1.0
    assert aps[0] == pytest.approx(1.0)

    # now make the duplicate outrank the true positive and remove the tp:
    preds = [EvalBox("s0", "car", _box(x=100.0), score=0.95),  # miss
             EvalBox("s0", "car", b.copy(), score=0.9)]
    aps = get_average_precisions(gt, preds, CLASSES, 0.5)
    # rank1 fp (P=0), rank2 tp (P=0.5, R=1) -> AP = 0.5
    assert aps[0] == pytest.approx(0.5)


def test_half_recall_ap():
    gt = [EvalBox("s0", "car", _box()), EvalBox("s0", "car", _box(x=50.0))]
    preds = [EvalBox("s0", "car", _box(), score=0.9)]  # finds only one
    aps = get_average_precisions(gt, preds, CLASSES, 0.5)
    assert aps[0] == pytest.approx(0.5)  # P=1 up to R=0.5, then nothing


def test_threshold_sweep_drops_marginal_match():
    # prediction overlapping GT with 3D IoU ~ 0.6: offset so bev inter known
    gt_box = _box()
    # x offset 0.9: inter 3.1x2=6.2, union 16-6.2=9.8 -> iou ~0.6327
    # (avoid landing exactly ON a threshold — float noise makes that flaky)
    pred_box = _box(x=0.9)
    assert iou_3d_np(gt_box[None], pred_box[None])[0, 0] == pytest.approx(
        6.2 / 9.8, abs=1e-6)
    gt = [EvalBox("s0", "car", gt_box)]
    preds = [EvalBox("s0", "car", pred_box, score=0.9)]
    mAP, table = lyft_map(gt, preds, CLASSES)
    # matches at t = 0.50, 0.55, 0.60 (3 of 10 thresholds)
    assert table[0.5][0] == pytest.approx(1.0)
    assert table[0.6][0] == pytest.approx(1.0)
    assert table[0.65][0] == pytest.approx(0.0)
    assert mAP == pytest.approx(0.3)


def test_cross_sample_isolation():
    """A prediction must never match GT from another sample."""
    b = _box()
    gt = [EvalBox("s0", "car", b)]
    preds = [EvalBox("s1", "car", b.copy(), score=0.9)]  # wrong sample
    aps = get_average_precisions(gt, preds, CLASSES, 0.5)
    assert aps[0] == pytest.approx(0.0)


def test_class_isolation():
    b = _box()
    gt = [EvalBox("s0", "car", b)]
    preds = [EvalBox("s0", "pedestrian", b.copy(), score=0.9)]
    aps = get_average_precisions(gt, preds, CLASSES, 0.5)
    assert aps[0] == pytest.approx(0.0)   # car GT unmatched
    assert np.isnan(aps[1])               # no pedestrian GT
