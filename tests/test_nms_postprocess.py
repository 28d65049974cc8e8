"""On-device NMS + postprocess vs the NumPy reference (SURVEY.md section 4:
'NMS vs O(n^2) reference'; postprocess must be box-for-box identical)."""

import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.ops.anchors import make_anchors
from tpu_pillars.ops.nms import rotated_nms
from tpu_pillars.ops.postprocess import postprocess
from tpu_pillars.reference_cpu.postprocess import (
    postprocess_np, rotated_nms_np,
)

CFG = tiny_config()


def _random_boxes(rng, n, span=10.0):
    b = np.zeros((n, 7), dtype=np.float32)
    b[:, 0:2] = rng.uniform(-span, span, (n, 2))
    b[:, 2] = rng.uniform(-1, 1, n)
    b[:, 3] = rng.uniform(0.5, 3.0, n)
    b[:, 4] = rng.uniform(0.5, 6.0, n)
    b[:, 5] = rng.uniform(0.5, 3.0, n)
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_nms_matches_reference_greedy(rng):
    n = 64
    boxes = _random_boxes(rng, n, span=6.0)  # dense -> many suppressions
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sboxes, sscores = boxes[order], scores[order]

    keep = np.asarray(rotated_nms(
        jnp.asarray(sboxes), jnp.asarray(sscores),
        jnp.ones(n, bool), 0.3,
    ))
    kept_sorted_idx = order[np.nonzero(keep)[0]]

    ref_keep = rotated_nms_np(boxes, scores, 0.3, max_out=n)
    np.testing.assert_array_equal(np.sort(kept_sorted_idx), np.sort(ref_keep))


def test_nms_respects_valid_mask(rng):
    boxes = np.tile(np.array([[0, 0, 0, 2, 4, 1, 0.2]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    valid = np.array([False, True, True, True])
    keep = np.asarray(rotated_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(valid), 0.5))
    # invalid top box neither kept nor suppressing; next box suppresses rest
    np.testing.assert_array_equal(keep, [False, True, False, False])


def test_nms_keeps_disjoint(rng):
    boxes = _random_boxes(rng, 16, span=500.0)  # far apart -> all kept
    scores = rng.uniform(0.1, 1.0, 16).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    keep = np.asarray(rotated_nms(jnp.asarray(boxes[order]),
                                  jnp.asarray(scores[order]),
                                  jnp.ones(16, bool), 0.1))
    assert keep.all()


def _random_head_outputs(rng, cfg):
    A = cfg.num_anchors
    # mostly-background logits with some strong positives
    cls = rng.normal(-4.0, 1.0, (A, cfg.num_classes)).astype(np.float32)
    hot = rng.choice(A, 40, replace=False)
    cls[hot, rng.integers(0, cfg.num_classes, 40)] = rng.normal(3.0, 1.0, 40)
    deltas = (rng.normal(0, 0.1, (A, 7))).astype(np.float32)
    dirs = rng.normal(0, 1.0, (A, 2)).astype(np.float32)
    return cls, deltas, dirs


def test_postprocess_matches_reference(rng):
    cfg = CFG
    anchors, anchor_cls = make_anchors(cfg)
    cls, deltas, dirs = _random_head_outputs(rng, cfg)

    det = postprocess(jnp.asarray(cls), jnp.asarray(deltas), jnp.asarray(dirs),
                      jnp.asarray(anchors), jnp.asarray(anchor_cls), cfg)
    got_boxes = np.asarray(det.boxes)[np.asarray(det.valid)]
    got_scores = np.asarray(det.scores)[np.asarray(det.valid)]
    got_cls = np.asarray(det.class_ids)[np.asarray(det.valid)]

    ref_boxes, ref_scores, ref_cls = postprocess_np(
        cls, deltas, dirs, anchors, anchor_cls, cfg)

    assert len(got_boxes) == len(ref_boxes)
    np.testing.assert_array_equal(got_cls, ref_cls)
    np.testing.assert_allclose(got_scores, ref_scores, atol=1e-5)
    np.testing.assert_allclose(got_boxes, ref_boxes, atol=1e-4)


def test_postprocess_empty_when_all_background(rng):
    cfg = CFG
    anchors, anchor_cls = make_anchors(cfg)
    A = cfg.num_anchors
    cls = np.full((A, cfg.num_classes), -10.0, np.float32)
    det = postprocess(jnp.asarray(cls),
                      jnp.zeros((A, 7), jnp.float32),
                      jnp.zeros((A, 2), jnp.float32),
                      jnp.asarray(anchors), jnp.asarray(anchor_cls), cfg)
    assert not np.asarray(det.valid).any()
    np.testing.assert_allclose(np.asarray(det.boxes), 0.0)


def test_nms_long_suppression_chain(rng):
    """Adversarial chain: a row of boxes each overlapping only its neighbor,
    scores descending — greedy keeps every other box. Exercises the fixpoint
    sweep's convergence depth (one sweep per chain level)."""
    n = 40
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = np.arange(n) * 1.2   # centers 1.2 apart
    boxes[:, 3] = 2.0                  # w
    boxes[:, 4] = 2.0                  # l -> neighbor IoU = 0.8/3.2 = 0.25
    boxes[:, 5] = 1.0
    scores = np.linspace(0.9, 0.5, n).astype(np.float32)

    keep = np.asarray(rotated_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.ones(n, bool), 0.2))
    expect = np.arange(n) % 2 == 0
    np.testing.assert_array_equal(keep, expect)

    ref = rotated_nms_np(boxes, scores, 0.2, max_out=n)
    np.testing.assert_array_equal(np.sort(np.nonzero(keep)[0]), np.sort(ref))


def test_postprocess_w_matches_anchor_major(rng):
    # the serving-wire twin (detector stage 2): own-class logits canonical,
    # box/dir feature-major in the conv-natural PERMUTED anchor order
    # (a'' = a_loc * HW + hw) — must be bit-identical to postprocess
    from tpu_pillars.ops.postprocess import postprocess_w

    cfg = CFG
    anchors, anchor_cls = make_anchors(cfg)
    cls, deltas, dirs = _random_head_outputs(rng, cfg)
    a = postprocess(jnp.asarray(cls), jnp.asarray(deltas), jnp.asarray(dirs),
                    jnp.asarray(anchors), jnp.asarray(anchor_cls), cfg)

    A, A_loc = cfg.num_anchors, cfg.anchors_per_loc
    hw = A // A_loc
    own = cls[np.arange(A), anchor_cls]
    # canonical a = hw * A_loc + a_loc  ->  permuted a'' = a_loc * HW + hw
    box_p = deltas.reshape(hw, A_loc, 7).transpose(2, 1, 0).reshape(7, A)
    dir_p = dirs.reshape(hw, A_loc, 2).transpose(2, 1, 0).reshape(2, A)
    b = postprocess_w(jnp.asarray(own), jnp.asarray(box_p),
                      jnp.asarray(dir_p), jnp.asarray(anchors),
                      jnp.asarray(anchor_cls), cfg)
    for name, x, y in zip(a._fields, a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_postprocess_t_matches_anchor_major(rng):
    # the feature-major twin (the detector's actual stage-2 path) must be
    # bit-identical to the anchor-major postprocess
    from tpu_pillars.ops.postprocess import postprocess_t

    cfg = CFG
    anchors, anchor_cls = make_anchors(cfg)
    cls, deltas, dirs = _random_head_outputs(rng, cfg)
    a = postprocess(jnp.asarray(cls), jnp.asarray(deltas), jnp.asarray(dirs),
                    jnp.asarray(anchors), jnp.asarray(anchor_cls), cfg)
    b = postprocess_t(jnp.asarray(cls.T), jnp.asarray(deltas.T),
                      jnp.asarray(dirs.T), jnp.asarray(anchors),
                      jnp.asarray(anchor_cls), cfg)
    for name, x, y in zip(a._fields, a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)
