"""Block-gated Pallas NMS overlap kernel vs the XLA fixpoint path and the
float64 S-H oracle (interpret mode off-TPU; same equivalence contract as
tests/test_assign_pallas.py — formulas identical, fma scheduling may flip
pairs whose IoU sits within ulps of the threshold, so mismatches must be
explained by a float64 boundary check)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.ops.iou import rotated_iou_bev
from tpu_pillars.ops.nms import rotated_nms
from tpu_pillars.ops.nms_pallas import (
    overlap_matrix_pallas, rotated_nms_pallas,
)
from tpu_pillars.reference_cpu.postprocess import rotated_iou_bev_np

THR = 0.2
BOUNDARY_TOL = 1e-4


def _random_boxes(rng, n, span=10.0):
    b = np.zeros((n, 7), dtype=np.float32)
    b[:, 0:2] = rng.uniform(-span, span, (n, 2))
    b[:, 2] = rng.uniform(-1, 1, n)
    b[:, 3] = rng.uniform(0.5, 3.0, n)
    b[:, 4] = rng.uniform(0.5, 6.0, n)
    b[:, 5] = rng.uniform(0.5, 3.0, n)
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def _class_shifted(rng, n, num_classes=9, span=50.0, return_cls=False):
    """Mimic _nms_and_pack's class-aware shift: per-box class offset of
    4 * (x_span + y_span) along x — the layout the kernel's distance
    gating is designed around."""
    b = _random_boxes(rng, n, span=span)
    cls = rng.integers(0, num_classes, n)
    b[:, 0] += cls * 4.0 * (2 * span + 2 * span)
    return (b, cls) if return_cls else b


def _check_over(boxes, thr=THR):
    """Kernel over-matrix == XLA over-matrix, with mismatches allowed only
    on float64-boundary pairs (|iou - thr| < tol)."""
    k = boxes.shape[0]
    got = np.asarray(overlap_matrix_pallas(jnp.asarray(boxes), thr))
    iou = np.asarray(rotated_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    idx = np.arange(k)
    want = (iou > thr) & (idx[:, None] < idx[None, :])
    if not np.array_equal(got, want):
        bad = np.argwhere(got != want)
        iou64 = rotated_iou_bev_np(boxes[bad[:, 0]], boxes[bad[:, 1]])
        iou64 = np.diagonal(iou64)
        assert np.all(np.abs(iou64 - thr) < BOUNDARY_TOL), (
            f"{len(bad)} non-boundary over-matrix flips; "
            f"worst |iou-thr|={np.max(np.abs(iou64 - thr)):.2e}")
    return got, want


def test_over_matrix_dense_scene(rng):
    boxes = _random_boxes(rng, 128, span=6.0)   # dense, many overlaps
    got, _ = _check_over(boxes)
    assert got.sum() > 50                       # scenario sanity: real work


def test_over_matrix_padding_to_block_multiple(rng):
    # 200 -> padded to 256 inside the kernel; dummy rows/cols must not leak
    boxes = _random_boxes(rng, 200, span=8.0)
    _check_over(boxes)


def test_over_matrix_class_shifted(rng):
    # dense base area (span 8 m) so same-class boxes genuinely overlap
    boxes, cls = _class_shifted(rng, 256, span=8.0, return_cls=True)
    got, want = _check_over(boxes)
    # the gating design premise: shifted cross-class pairs NEVER overlap
    cross = cls[:, None] != cls[None, :]
    assert not got[cross].any(), "cross-class overlap under the 4*span shift"
    # and the scene still exercises real same-class suppression work
    assert got.sum() > 0


def test_keep_matches_fixpoint_nms(rng):
    for trial in range(3):
        n = 256
        boxes, cls = _class_shifted(rng, n, span=30.0, return_cls=True)
        scores = np.sort(rng.uniform(0.1, 1.0, n))[::-1].astype(np.float32)
        valid = rng.uniform(size=n) > 0.1
        keep_x = np.asarray(rotated_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), THR))
        for kw in ({}, {"class_ids": jnp.asarray(cls, jnp.int32)}):
            keep_p = np.asarray(rotated_nms_pallas(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
                THR, **kw))
            if not np.array_equal(keep_x, keep_p):
                # a divergence must trace to a threshold-boundary pair
                # INVOLVING a diverged box (a flip cascades only through
                # boxes it overlaps) — a boundary pair elsewhere in the
                # scene is no excuse
                bad = np.nonzero(keep_x != keep_p)[0]
                iou64 = rotated_iou_bev_np(boxes[bad], boxes)
                assert np.any(np.abs(iou64 - THR) < BOUNDARY_TOL), (
                    f"keep sets diverge at {bad} ({kw.keys()}) with no "
                    f"boundary pair involving those boxes")


def test_keep_valid_mask_semantics():
    # invalid top box neither kept nor suppressing (mirrors the fixpoint test)
    boxes = np.tile(np.array([[0, 0, 0, 2, 4, 1, 0.2]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    valid = np.array([False, True, True, True])
    keep = np.asarray(rotated_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5))
    np.testing.assert_array_equal(keep, [False, True, False, False])


def test_keep_all_disjoint(rng):
    boxes = _random_boxes(rng, 64, span=500.0)
    keep = np.asarray(rotated_nms_pallas(
        jnp.asarray(boxes), jnp.ones(64, np.float32),
        jnp.ones(64, bool), 0.1))
    assert keep.all()


def test_postprocess_nms_impl_parity(rng):
    """postprocess(nms_impl='pallas') == the fixpoint default end-to-end on
    realistic head outputs (the wiring the TPU default flip would use)."""
    from tpu_pillars.config import tiny_config
    from tpu_pillars.ops.anchors import make_anchors
    from tpu_pillars.ops.postprocess import postprocess

    cfg = tiny_config()
    anchors, anchor_cls = make_anchors(cfg)
    A = cfg.num_anchors
    cls = rng.normal(-4.0, 1.0, (A, cfg.num_classes)).astype(np.float32)
    hot = rng.choice(A, 40, replace=False)
    cls[hot, rng.integers(0, cfg.num_classes, 40)] = rng.normal(3.0, 1.0, 40)
    deltas = rng.normal(0, 0.1, (A, 7)).astype(np.float32)
    dirs = rng.normal(0, 1.0, (A, 2)).astype(np.float32)
    args = (jnp.asarray(cls), jnp.asarray(deltas), jnp.asarray(dirs),
            jnp.asarray(anchors), jnp.asarray(anchor_cls), cfg)
    a = postprocess(*args)
    b = postprocess(*args, nms_impl="pallas")
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
    np.testing.assert_array_equal(np.asarray(a.class_ids),
                                  np.asarray(b.class_ids))


def test_nms_impl_auto_resolution():
    """'auto' resolves to the measured per-backend winner (pallas on TPU,
    fixpoint elsewhere), and bad names fail at build time."""
    import pytest

    from tpu_pillars.ops.postprocess import resolve_nms_impl

    expected = "pallas" if jax.default_backend() == "tpu" else "fixpoint"
    assert resolve_nms_impl("auto") == expected
    assert resolve_nms_impl("fixpoint") == "fixpoint"
    assert resolve_nms_impl("pallas") == "pallas"
    with pytest.raises(ValueError, match="nms_impl"):
        resolve_nms_impl("fastest")
    # build_postprocess_fn validates eagerly, before any trace
    from tpu_pillars.config import tiny_config
    from tpu_pillars.detector import build_postprocess_fn

    with pytest.raises(ValueError, match="nms_impl"):
        build_postprocess_fn(tiny_config(), nms_impl="fastest")


def test_top_k_two_stage_exact(rng):
    """Values AND indices (incl. lowest-index tie-breaks) must equal
    lax.top_k — the candidate-selection contract of _top_candidates."""
    from jax import lax

    from tpu_pillars.ops.postprocess import top_k_two_stage

    for n, k, rows in [(7200, 128, 16), (7201, 100, 16), (500, 500, 8),
                       (4096, 64, 64)]:
        x = rng.normal(size=n).astype(np.float32)
        # heavy ties: quantize half the values onto a small grid
        tie = rng.uniform(size=n) < 0.5
        x[tie] = np.round(x[tie] * 4) / 4
        xv = jnp.asarray(x)
        wv, wi = lax.top_k(xv, k)
        gv, gi = top_k_two_stage(xv, k, rows=rows)
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))


def test_vmapped_over_batch(rng):
    """postprocess vmaps NMS over the batch — the kernel must survive vmap."""
    B, n = 3, 128
    boxes = np.stack([_random_boxes(rng, n, span=7.0) for _ in range(B)])
    valid = np.ones((B, n), bool)
    f = jax.vmap(lambda b, v: rotated_nms_pallas(
        b, jnp.zeros(n), v, THR))
    keep_b = np.asarray(f(jnp.asarray(boxes), jnp.asarray(valid)))
    for i in range(B):
        keep_1 = np.asarray(rotated_nms_pallas(
            jnp.asarray(boxes[i]), jnp.zeros(n), jnp.ones(n, bool), THR))
        np.testing.assert_array_equal(keep_b[i], keep_1)
