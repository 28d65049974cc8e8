"""Cross-validation of the two independent Lyft-mAP implementations.

evaluation/map_eval.py and evaluation/map_eval_alt.py implement the written
competition definition with deliberately different algorithmic shapes (see
map_eval_alt's module docstring). These tests pin them against each other to
1e-9 on randomized multi-sample scenarios and on adversarial protocol
vectors (score ties, duplicate detections, cross-sample leakage, empty
classes) — bounding the risk that a single re-derivation silently diverges
from the SDK scorer (VERDICT round-2 'Missing #1')."""

import numpy as np
import pytest

from tpu_pillars.evaluation.map_eval import (
    EvalBox, get_average_precisions, iou_3d_np, lyft_map,
)
from tpu_pillars.evaluation.map_eval_alt import (
    get_average_precisions_alt, iou_3d_pairwise, lyft_map_alt,
)

CLASSES = ["car", "pedestrian", "bicycle"]


def _rand_box(rng, near=None):
    if near is not None:
        # perturbation of an existing box: overlapping, varied IoU
        b = near + rng.normal(0, [1.0, 1.0, 0.3, 0.4, 0.8, 0.2, 0.3], 7)
        b[3:6] = np.abs(b[3:6]) + 0.3
        return b
    return np.array([
        rng.uniform(-40, 40), rng.uniform(-40, 40), rng.uniform(-2, 1),
        rng.uniform(0.5, 3.0), rng.uniform(0.5, 6.0), rng.uniform(0.8, 3.0),
        rng.uniform(-np.pi, np.pi)])


def _random_scenario(rng, n_samples=4, quantize_scores=False):
    """GT + predictions across samples/classes with overlaps, misses, FPs."""
    gts, preds = [], []
    for si in range(n_samples):
        tok = f"s{si}"
        for cname in CLASSES:
            for _ in range(rng.integers(0, 4)):
                g = _rand_box(rng)
                gts.append(EvalBox(tok, cname, g))
                # 0-2 predictions near this GT
                for _ in range(rng.integers(0, 3)):
                    score = rng.uniform(0, 1)
                    if quantize_scores:   # force plenty of exact ties
                        score = round(score * 4) / 4
                    preds.append(EvalBox(tok, cname, _rand_box(rng, g),
                                         float(score)))
            # unmatched false positives
            for _ in range(rng.integers(0, 2)):
                score = rng.uniform(0, 1)
                if quantize_scores:
                    score = round(score * 4) / 4
                preds.append(EvalBox(tok, cname, _rand_box(rng),
                                     float(score)))
    return gts, preds


def _assert_agree(gts, preds, classes=CLASSES):
    m1, t1 = lyft_map(gts, preds, classes)
    m2, t2 = lyft_map_alt(gts, preds, classes)
    assert abs(m1 - m2) < 1e-9
    for thr in t1:
        np.testing.assert_allclose(t1[thr], t2[thr], rtol=0, atol=1e-9)


def test_iou3d_implementations_agree(rng):
    boxes1 = np.stack([_rand_box(rng) for _ in range(12)])
    boxes2 = np.stack([_rand_box(rng, boxes1[i % 12]) if i % 2 else
                       _rand_box(rng) for i in range(10)])
    got = iou_3d_pairwise(boxes1, boxes2)
    want = iou_3d_np(boxes1, boxes2)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
    # identical boxes: exactly 1.0 in both
    same = np.stack([_rand_box(rng) for _ in range(3)])
    np.testing.assert_allclose(iou_3d_pairwise(same, same).diagonal(), 1.0,
                               atol=1e-12)
    np.testing.assert_allclose(iou_3d_np(same, same).diagonal(), 1.0,
                               atol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_randomized_scenarios_agree(seed):
    rng = np.random.default_rng(seed)
    gts, preds = _random_scenario(rng)
    _assert_agree(gts, preds)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_randomized_with_score_ties_agree(seed):
    # quantized scores force many exact ties — both scorers must break them
    # by input order (stable sort), per the written definition
    rng = np.random.default_rng(seed)
    gts, preds = _random_scenario(rng, quantize_scores=True)
    _assert_agree(gts, preds)


def test_duplicate_detections():
    # the same detection submitted twice: first (by stable order) matches,
    # the duplicate must count as FP. AP at any threshold <= 0.95 for one
    # GT with [TP, FP] at equal scores: precision envelope gives AP = 1.0
    g = np.array([0, 0, 0, 2, 4, 1.5, 0.3])
    gts = [EvalBox("s0", "car", g)]
    preds = [EvalBox("s0", "car", g.copy(), 0.9),
             EvalBox("s0", "car", g.copy(), 0.9)]
    for scorer in (get_average_precisions, get_average_precisions_alt):
        aps = scorer(gts, preds, CLASSES, 0.5)
        assert abs(aps[0] - 1.0) < 1e-12, scorer
        assert np.isnan(aps[1]) and np.isnan(aps[2])
    _assert_agree(gts, preds)


def test_cross_sample_leakage():
    # a prediction in sample B that would match GT in sample A must be FP:
    # matching is within the prediction's own sample only
    g = np.array([5, 5, 0, 2, 4, 1.5, 0.0])
    gts = [EvalBox("sA", "car", g)]
    preds = [EvalBox("sB", "car", g.copy(), 0.9)]
    for scorer in (get_average_precisions, get_average_precisions_alt):
        aps = scorer(gts, preds, CLASSES, 0.5)
        assert aps[0] == 0.0, scorer
    _assert_agree(gts, preds)


def test_empty_classes_and_empty_inputs():
    g = np.array([0, 0, 0, 2, 4, 1.5, 0.0])
    gts = [EvalBox("s0", "car", g)]
    # class with predictions but no GT -> NaN AP, excluded from the mean;
    # the FP predictions must not crash either scorer
    preds = [EvalBox("s0", "pedestrian", _shift(g, 20), 0.7),
             EvalBox("s0", "car", g.copy(), 0.8)]
    for scorer in (get_average_precisions, get_average_precisions_alt):
        aps = scorer(gts, preds, CLASSES, 0.5)
        assert abs(aps[0] - 1.0) < 1e-12
        assert np.isnan(aps[1]) and np.isnan(aps[2])
    _assert_agree(gts, preds)
    # no predictions at all: AP 0 for classes with GT
    for scorer in (get_average_precisions, get_average_precisions_alt):
        aps = scorer(gts, [], CLASSES, 0.5)
        assert aps[0] == 0.0
    _assert_agree(gts, [])
    # no GT at all: all NaN -> mAP 0.0 by convention in both
    m1, _ = lyft_map([], preds, CLASSES)
    m2, _ = lyft_map_alt([], preds, CLASSES)
    assert m1 == 0.0 and m2 == 0.0


def test_iou_tie_goes_to_first_gt():
    # two identical GTs, one prediction: both scorers must match the FIRST
    # (input-order) GT, leaving the second unmatched; a second identical
    # prediction then matches the second GT (both TP)
    g = np.array([0, 0, 0, 2, 4, 1.5, 0.0])
    gts = [EvalBox("s0", "car", g.copy()), EvalBox("s0", "car", g.copy())]
    preds = [EvalBox("s0", "car", g.copy(), 0.9),
             EvalBox("s0", "car", g.copy(), 0.8)]
    for scorer in (get_average_precisions, get_average_precisions_alt):
        aps = scorer(gts, preds, CLASSES, 0.5)
        assert abs(aps[0] - 1.0) < 1e-12, scorer
    _assert_agree(gts, preds)


def test_hand_computed_ap_vector():
    # one sample, 2 GT cars; preds: TP@0.9, FP@0.8, TP@0.7 ->
    # PR points: (0.5, 1), (0.5, 1/2), (1.0, 2/3); envelope: 1, 2/3, 2/3
    # AP = 0.5*1 + 0.5*(2/3) = 5/6
    g1 = np.array([0, 0, 0, 2, 4, 1.5, 0.0])
    g2 = np.array([10, 0, 0, 2, 4, 1.5, 0.0])
    far = np.array([-20, -20, 0, 2, 4, 1.5, 0.0])
    gts = [EvalBox("s0", "car", g1), EvalBox("s0", "car", g2)]
    preds = [EvalBox("s0", "car", g1.copy(), 0.9),
             EvalBox("s0", "car", far, 0.8),
             EvalBox("s0", "car", g2.copy(), 0.7)]
    for scorer in (get_average_precisions, get_average_precisions_alt):
        aps = scorer(gts, preds, CLASSES, 0.5)
        assert abs(aps[0] - 5.0 / 6.0) < 1e-12, scorer
    _assert_agree(gts, preds)


def _shift(box, dx):
    b = box.copy()
    b[0] += dx
    return b


# --- protocol rows 6-7 (docs/MAP_PROTOCOL.md): both ambiguous rules are
# IMPLEMENTED in both scorers; these vectors are constructed so the rules
# actually diverge, pinning each rule's semantics and the pairwise agreement.

def test_match_rule_divergence_vector():
    # Crowded-scene corner: two overlapping GTs, two identical predictions
    # on GT A. A=[0,0,0,2,4,1.5,0], B=x+0.5 -> IoU(A,B)=7/9≈0.778.
    # mask_argmax: pred2's best UNMATCHED GT is B (0.778>=0.5) -> TP, AP=1.
    # argmax_check: pred2's single argmax is A (1.0), already matched -> FP,
    # tp=[1,0] -> AP=0.5.
    A = np.array([0, 0, 0, 2, 4, 1.5, 0.0])
    B = _shift(A, 0.5)
    gts = [EvalBox("s0", "car", A), EvalBox("s0", "car", B)]
    preds = [EvalBox("s0", "car", A.copy(), 0.9),
             EvalBox("s0", "car", A.copy(), 0.8)]
    for scorer in (get_average_precisions, get_average_precisions_alt):
        ap_mask = scorer(gts, preds, CLASSES, 0.5,
                         match_rule="mask_argmax")[0]
        ap_chk = scorer(gts, preds, CLASSES, 0.5,
                        match_rule="argmax_check")[0]
        assert abs(ap_mask - 1.0) < 1e-12, scorer
        assert abs(ap_chk - 0.5) < 1e-12, scorer


def test_tie_order_divergence_vector():
    # Exact score tie between an FP and a TP, input order [FP, TP]:
    # stable visits FP first -> tp=[0,1] -> AP=0.5;
    # reversed visits TP first -> tp=[1,0] -> AP=1.0.
    g = np.array([0, 0, 0, 2, 4, 1.5, 0.0])
    gts = [EvalBox("s0", "car", g)]
    preds = [EvalBox("s0", "car", _shift(g, 30), 0.5),   # FP
             EvalBox("s0", "car", g.copy(), 0.5)]        # TP
    for scorer in (get_average_precisions, get_average_precisions_alt):
        ap_stable = scorer(gts, preds, CLASSES, 0.5, tie_order="stable")[0]
        ap_rev = scorer(gts, preds, CLASSES, 0.5, tie_order="reversed")[0]
        assert abs(ap_stable - 0.5) < 1e-12, scorer
        assert abs(ap_rev - 1.0) < 1e-12, scorer


def _crowded_scenario(rng, n_samples=3):
    """Clustered same-class GTs overlapping each other ABOVE 0.5 IoU, with
    predictions placed on members and on midpoints between members — the
    regime where rows 6-7 genuinely diverge (a prediction's best and
    second-best GT both clear the threshold).

    Geometry: fixed 2x4 boxes in a line with ~0.8-1.2 m spacing along the
    length axis give neighbor IoU (4-s)/(4+s) ≈ 0.54-0.67; a midpoint
    prediction overlaps both neighbors at ≈0.6-0.8."""
    gts, preds = [], []
    dims = np.array([2.0, 4.0, 1.5])
    for si in range(n_samples):
        tok = f"s{si}"
        for cname in CLASSES:
            for _ in range(rng.integers(1, 3)):   # clusters per class
                cx, cy = rng.uniform(-40, 40, 2)
                yaw = rng.uniform(-np.pi, np.pi)
                ux, uy = np.cos(yaw), np.sin(yaw)  # cluster line = heading
                n_in = int(rng.integers(2, 5))
                members = []
                pos = 0.0
                for k in range(n_in):
                    g = np.array([cx + ux * pos, cy + uy * pos, 0.0,
                                  dims[0], dims[1], dims[2], yaw])
                    members.append(g)
                    gts.append(EvalBox(tok, cname, g))
                    pos += rng.uniform(0.8, 1.2)
                # predictions: on members (small jitter) and on midpoints
                for g in members:
                    for _ in range(rng.integers(1, 3)):
                        p = g.copy()
                        p[:2] += rng.normal(0, 0.15, 2)
                        score = round(float(rng.uniform(0, 1)) * 4) / 4
                        preds.append(EvalBox(tok, cname, p, score))
                for a, b in zip(members[:-1], members[1:]):
                    p = (a + b) / 2.0
                    p[:2] += rng.normal(0, 0.1, 2)
                    score = round(float(rng.uniform(0, 1)) * 4) / 4
                    preds.append(EvalBox(tok, cname, p, score))
    return gts, preds


@pytest.mark.parametrize("seed", [20, 21, 22])
@pytest.mark.parametrize("match_rule", ["mask_argmax", "argmax_check"])
@pytest.mark.parametrize("tie_order", ["stable", "numpy", "reversed"])
def test_crowded_scenarios_agree_under_all_rules(seed, match_rule, tie_order):
    # every (match_rule, tie_order) combination: the two scorers must agree
    # to 1e-9 on crowded scenes where the rules genuinely diverge
    rng = np.random.default_rng(seed)
    gts, preds = _crowded_scenario(rng)
    m1, t1 = lyft_map(gts, preds, CLASSES, iou_thresholds=(0.5, 0.7),
                      match_rule=match_rule, tie_order=tie_order)
    m2, t2 = lyft_map_alt(gts, preds, CLASSES, iou_thresholds=(0.5, 0.7),
                          match_rule=match_rule, tie_order=tie_order)
    assert abs(m1 - m2) < 1e-9
    for thr in t1:
        np.testing.assert_allclose(t1[thr], t2[thr], rtol=0, atol=1e-9)


def test_match_rule_delta_is_bounded_on_crowded_scenes():
    # the actual protocol-risk bound (docs/MAP_PROTOCOL.md row 6): on
    # deliberately crowded scenes the mask_argmax vs argmax_check mAP delta
    # is small and one-sided (mask_argmax can only convert FP->TP, never
    # the reverse, so its mAP >= argmax_check's)
    deltas = []
    for seed in range(30, 36):
        rng = np.random.default_rng(seed)
        gts, preds = _crowded_scenario(rng)
        m_mask, _ = lyft_map(gts, preds, CLASSES)
        m_chk, _ = lyft_map(gts, preds, CLASSES, match_rule="argmax_check")
        assert m_mask >= m_chk - 1e-12
        deltas.append(m_mask - m_chk)
    # measured 2026-08-20 (seeds 30-35, crowded generator, full sweep):
    # max delta 0.0595, mean 0.0282 — recorded in docs/MAP_PROTOCOL.md
    # row 6. Bound at ~1.7x the measured max: these are deliberately
    # adversarial scenes; a break here means a matching-rule regression.
    assert max(deltas) < 0.10
