"""Unit tests: losses vs hand computations, target assigner on known
geometry (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.ops.anchors import make_anchors
from tpu_pillars.ops.box_coder import encode_boxes
from tpu_pillars.ops.losses import (
    detection_loss, sigmoid_focal_loss, smooth_l1,
)
from tpu_pillars.ops.target_assigner import Targets, assign_targets

CFG = tiny_config()


# ---------------- losses vs hand math ----------------

def test_focal_loss_hand_value():
    # logit 0, target 1: p=0.5, ce=log(2); focal = alpha*(0.5^gamma)*log2
    got = float(sigmoid_focal_loss(jnp.array([0.0]), jnp.array([1.0]),
                                   alpha=0.25, gamma=2.0)[0])
    assert got == pytest.approx(0.25 * 0.25 * np.log(2.0), rel=1e-5)
    # strong correct positive -> near zero
    tiny = float(sigmoid_focal_loss(jnp.array([10.0]), jnp.array([1.0]),
                                    alpha=0.25, gamma=2.0)[0])
    assert tiny < 1e-4
    # background target on strong positive logit -> large
    big = float(sigmoid_focal_loss(jnp.array([10.0]), jnp.array([0.0]),
                                   alpha=0.25, gamma=2.0)[0])
    assert big > 5.0


def test_focal_loss_matches_naive_formula(rng):
    logits = jnp.asarray(rng.normal(0, 3, (50, 9)).astype(np.float32))
    targets = jnp.asarray((rng.uniform(size=(50, 9)) < 0.1).astype(np.float32))
    got = np.asarray(sigmoid_focal_loss(logits, targets, 0.25, 2.0))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    t = np.asarray(targets)
    ce = -(t * np.log(p) + (1 - t) * np.log1p(-p))
    pt = p * t + (1 - p) * (1 - t)
    at = 0.25 * t + 0.75 * (1 - t)
    want = at * (1 - pt) ** 2 * ce
    np.testing.assert_allclose(got, want, atol=5e-4)  # f32 vs f64 naive form


def test_smooth_l1_hand_values():
    beta = 1.0 / 9.0
    # below beta: quadratic
    x = beta / 2
    assert float(smooth_l1(jnp.array(x))) == pytest.approx(0.5 * x * x / beta)
    # above beta: linear
    assert float(smooth_l1(jnp.array(2.0))) == pytest.approx(2.0 - 0.5 * beta)
    # symmetric
    assert float(smooth_l1(jnp.array(-2.0))) == pytest.approx(2.0 - 0.5 * beta)


def test_detection_loss_perfect_prediction_is_small():
    cfg = CFG
    A = 32
    onehot = np.zeros((A, cfg.num_classes), np.float32)
    onehot[:4, 0] = 1.0
    targets = Targets(
        cls_onehot=jnp.asarray(onehot.T),
        reg_targets=jnp.zeros((7, A)),
        dir_targets=jnp.zeros((A,), jnp.int32),
        cls_weights=jnp.ones((A,)),
        reg_weights=jnp.asarray((np.arange(A) < 4).astype(np.float32)),
        num_pos=jnp.asarray(4.0),
    )
    # logits that nail the targets
    cls_logits = jnp.asarray((onehot * 2 - 1) * 20.0)
    box_deltas = jnp.zeros((A, 7))
    dir_logits = jnp.asarray(np.tile([20.0, -20.0], (A, 1)).astype(np.float32))
    out = detection_loss(cls_logits, box_deltas, dir_logits, targets, cfg)
    assert float(out.total) < 1e-3
    assert float(out.num_pos) == 4.0


def test_detection_loss_angle_sin_symmetry():
    """Localization loss must treat yaw error of pi as zero (sin encoding);
    the dir head owns the flip."""
    cfg = CFG
    A = 4
    targets = Targets(
        cls_onehot=jnp.zeros((cfg.num_classes, A)),
        reg_targets=jnp.zeros((7, A)),
        dir_targets=jnp.zeros((A,), jnp.int32),
        cls_weights=jnp.zeros((A,)),
        reg_weights=jnp.ones((A,)),
        num_pos=jnp.asarray(float(A)),
    )
    deltas = jnp.zeros((A, 7)).at[:, 6].set(jnp.pi)  # off by exactly pi
    out = detection_loss(jnp.zeros((A, cfg.num_classes)), deltas,
                         jnp.zeros((A, 2)), targets, cfg)
    assert float(out.loc) < 1e-9


# ---------------- target assigner ----------------

def _pad_gt(boxes, classes, G=8):
    gb = np.zeros((G, 7), np.float32)
    gc = np.zeros((G,), np.int32)
    gv = np.zeros((G,), bool)
    gb[: len(boxes)] = boxes
    gc[: len(classes)] = classes
    gv[: len(boxes)] = True
    return jnp.asarray(gb), jnp.asarray(gc), jnp.asarray(gv)


def test_assigner_gt_equal_to_anchor_is_positive():
    cfg = CFG
    anchors, anchor_cls = make_anchors(cfg)
    # pick a car anchor (class 0, yaw 0) in the middle of the grid
    idx = np.nonzero((anchor_cls == 0) & (anchors[:, 6] == 0.0)
                     & (np.abs(anchors[:, 0]) < 1) & (np.abs(anchors[:, 1]) < 1))[0][0]
    gt = anchors[idx : idx + 1].copy()
    gb, gc, gv = _pad_gt(gt, [0])
    t = assign_targets(jnp.asarray(anchors), jnp.asarray(anchor_cls),
                       gb, gc, gv, cfg, iou_chunk=4096)
    reg_w = np.asarray(t.reg_weights)
    assert reg_w[idx] == 1.0
    np.testing.assert_allclose(np.asarray(t.reg_targets)[:, idx], 0.0, atol=1e-5)
    assert np.asarray(t.cls_onehot)[0, idx] == 1.0
    # direction: gt yaw = 0 -> not > 0 -> class 0
    assert np.asarray(t.dir_targets)[idx] == 0
    assert float(t.num_pos) >= 1


def test_assigner_class_matching():
    """A pedestrian GT must never assign to car anchors."""
    cfg = CFG
    anchors, anchor_cls = make_anchors(cfg)
    ped = list(cfg.class_names).index("pedestrian")
    spec = cfg.classes[ped]
    gt = np.array([[0.2, 0.3, spec.z_center, spec.width, spec.length,
                    spec.height, 0.1]], np.float32)
    gb, gc, gv = _pad_gt(gt, [ped])
    t = assign_targets(jnp.asarray(anchors), jnp.asarray(anchor_cls),
                       gb, gc, gv, cfg, iou_chunk=4096)
    pos = np.asarray(t.reg_weights) > 0
    assert pos.any()
    assert (np.asarray(anchor_cls)[pos] == ped).all()
    assert np.asarray(t.cls_onehot)[ped, pos].all()


def test_assigner_force_match_low_iou_gt():
    """A GT whose IoU with every anchor is below matched_iou still claims its
    best anchor (force-match rule)."""
    cfg = CFG
    anchors, anchor_cls = make_anchors(cfg)
    car = 0
    # tiny car (half size), offset between anchor centers -> low IoU
    gt = np.array([[0.31, 0.22, -1.0, 0.9, 2.2, 0.8, 0.3]], np.float32)
    gb, gc, gv = _pad_gt(gt, [car])
    t = assign_targets(jnp.asarray(anchors), jnp.asarray(anchor_cls),
                       gb, gc, gv, cfg, iou_chunk=4096)
    assert float(t.num_pos) >= 1
    pos = np.asarray(t.reg_weights) > 0
    assert (np.asarray(anchor_cls)[pos] == car).all()


def test_assigner_no_gt_all_negative():
    cfg = CFG
    anchors, anchor_cls = make_anchors(cfg)
    gb, gc, gv = _pad_gt(np.zeros((0, 7), np.float32), [])
    t = assign_targets(jnp.asarray(anchors), jnp.asarray(anchor_cls),
                       gb, gc, gv, cfg, iou_chunk=4096)
    assert float(t.num_pos) == 0
    assert not (np.asarray(t.cls_onehot) > 0).any()
    # everything is a clean negative: cls_weights all 1
    np.testing.assert_allclose(np.asarray(t.cls_weights), 1.0)


@pytest.mark.slow
def test_classwise_assigner_matches_dense(rng):
    """Class-blocked assigner == dense assign_targets (bit-identical when no
    class exceeds its per-class GT capacity)."""
    import jax.numpy as jnp
    from tpu_pillars.data.synthetic import make_scene
    from tpu_pillars.ops.target_assigner import make_classwise_assigner

    cfg = CFG
    anchors, anchor_cls = make_anchors(cfg)
    scene = make_scene(rng, cfg, num_objects=10, clutter=100)
    G = 16
    gb, gc, gv = _pad_gt(scene.gt_boxes[:G], scene.gt_classes[:G], G=G)

    dense = assign_targets(jnp.asarray(anchors), jnp.asarray(anchor_cls),
                           gb, gc, gv, cfg, iou_chunk=4096)
    cw = make_classwise_assigner(cfg, max_gt_per_class=8, iou_chunk=4096)(
        gb, gc, gv)

    np.testing.assert_array_equal(np.asarray(cw.reg_weights),
                                  np.asarray(dense.reg_weights))
    np.testing.assert_array_equal(np.asarray(cw.cls_weights),
                                  np.asarray(dense.cls_weights))
    np.testing.assert_array_equal(np.asarray(cw.cls_onehot),
                                  np.asarray(dense.cls_onehot))
    np.testing.assert_array_equal(np.asarray(cw.dir_targets),
                                  np.asarray(dense.dir_targets))
    np.testing.assert_allclose(np.asarray(cw.reg_targets),
                               np.asarray(dense.reg_targets), atol=1e-6)
    assert float(cw.num_pos) == float(dense.num_pos)


def test_assigner_no_gt_reg_targets_finite():
    """Regression: padded zero GT used to inject log(0) NaNs into
    reg_targets, which 0-weight multiplication cannot mask (0*nan=nan) —
    any training sample without GT would NaN the loss."""
    cfg = CFG
    anchors, anchor_cls = make_anchors(cfg)
    gb, gc, gv = _pad_gt(np.zeros((0, 7), np.float32), [])
    t = assign_targets(jnp.asarray(anchors), jnp.asarray(anchor_cls),
                       gb, gc, gv, cfg, iou_chunk=4096)
    assert np.isfinite(np.asarray(t.reg_targets)).all()
    out = detection_loss(
        jnp.zeros((cfg.num_anchors, cfg.num_classes)),
        jnp.zeros((cfg.num_anchors, 7)),
        jnp.zeros((cfg.num_anchors, 2)), t, cfg)
    assert np.isfinite(float(out.total))
