"""On-device postprocess: own-class sigmoid scores -> per-class threshold ->
static top-k -> decode + direction flip -> class-aware rotated NMS -> padded
detections (SURVEY.md 3.1 steps below the model; north-star requirement that
no per-frame host round-trips remain).

Implements the exact shared spec documented in reference_cpu.postprocess —
boolean filtering is replaced by masking + `lax.top_k` (static K), which is
the TPU-native equivalent (SURVEY.md section 7 step 5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tpu_pillars.config import PillarsConfig
from tpu_pillars.ops.box_coder import decode_boxes
from tpu_pillars.ops.nms import rotated_nms


class Detections(NamedTuple):
    """Static-size detection set (padded to config.max_detections)."""

    boxes: jnp.ndarray      # (D, 7)
    scores: jnp.ndarray     # (D,)
    class_ids: jnp.ndarray  # (D,) int32
    valid: jnp.ndarray      # (D,) bool


def wrap_angle(a):
    """Wrap to [-pi, pi) — mirrors reference_cpu.postprocess.wrap_angle."""
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


def top_k_two_stage(x, k: int, rows: int = 64):
    """Exact top-k over a long 1-D axis via per-row partial top-k.

    Every global top-k element lives in some row, and a row can hold at
    most k of them — so per-row top-k loses nothing, and the second top-k
    over the rows*k survivors is exact. Tie-breaking matches lax.top_k's
    lowest-index rule: per-row top-k is stable, and the concatenated
    candidate order (row-major, rank-minor) is monotone in original index
    for equal values.

    Candidate replacement for the (A=720k, k=1024) candidate selection in
    _top_candidates — sorts rows of A/rows instead of one A-length
    partial sort. MEASURED (v5e, 2026-08-18, scripts/probe_nms_pallas.py,
    batch-8 top-1024 of 720k): lax.top_k 28.11 ms vs two-stage 30.64 /
    30.68 / 28.32 ms at rows=32/64/128 — lax.top_k's single partial sort
    wins or ties at every row split, so this stays NON-default; kept as
    the exact-equivalence alternative (tests pin tie-break parity).
    """
    n = x.shape[0]
    m = -(-n // rows)                 # ceil; pad with -inf, never selected
    pad = rows * m - n
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), -jnp.inf, x.dtype)])
    v, i = lax.top_k(x.reshape(rows, m), min(k, m))        # (rows, k')
    flat_i = (jnp.arange(rows, dtype=i.dtype)[:, None] * m + i).reshape(-1)
    v2, sel = lax.top_k(v.reshape(-1), k)
    return v2, flat_i[sel]


def _top_candidates(own_logits, anchor_cls, config):
    """Own-class logits (A,) -> thresholded scores, static top-K."""
    scores = jax.nn.sigmoid(own_logits)
    thresholds = jnp.asarray(
        [c.score_threshold for c in config.classes], own_logits.dtype
    )[anchor_cls]
    masked = jnp.where(scores >= thresholds, scores, -1.0)
    top_scores, top_idx = lax.top_k(masked, config.pre_nms_top_k)
    return top_scores, top_idx, top_scores > 0.0     # ties -> lowest index


def postprocess_t(cls_t, box_t, dir_t, anchors, anchor_cls,
                  config: PillarsConfig,
                  nms_impl: str = "auto") -> Detections:
    """Feature-major postprocess: cls_t (num_classes, A), box_t (7, A),
    dir_t (2, A); anchors (A, 7), anchor_cls (A,) compile-time constants.

    Same math and bit-identical results as :func:`postprocess`; the layout
    is the point. Anchor-major (A, k) stage-1 outputs are stored
    lane-padded to 128 on TPU (a (720k, 9) f32 handoff occupies ~368 MB
    per sample and measured 10.8 ms just to read own-class scores at
    batch 8); with the anchor axis on lanes the same handoff is ~70 MB
    total and the own-score extract is a 9-way select."""
    n_cls = cls_t.shape[0]
    a = cls_t.shape[1]
    own = cls_t[0]
    for c in range(1, n_cls):
        own = jnp.where(anchor_cls == c, cls_t[c], own)
    top_scores, top_idx, cand_valid = _top_candidates(own, anchor_cls, config)

    # candidate gathers run on the FLAT view: a lane-axis gather
    # (box_t[:, idx]) is an XLA TPU pattern to avoid — 1-D gathers of
    # row-major offsets are the well-lowered form
    def take_cols(t):
        rows, k = t.shape[0], top_idx.shape[0]
        flat_idx = (jnp.arange(rows, dtype=top_idx.dtype)[:, None] * a
                    + top_idx[None, :])
        return t.reshape(rows * a)[flat_idx.reshape(-1)].reshape(rows, k)

    boxes = decode_boxes(take_cols(box_t).T, anchors[top_idx])
    dir_cls = jnp.argmax(take_cols(dir_t), axis=0)
    cls_of = anchor_cls[top_idx]
    return _nms_and_pack(boxes, dir_cls, cls_of, top_scores, cand_valid,
                         config, nms_impl)


def postprocess_w(own, box_p, dir_p, anchors, anchor_cls,
                  config: PillarsConfig,
                  nms_impl: str = "auto") -> Detections:
    """Serving-wire postprocess: own (A,) own-class logits in CANONICAL
    anchor order (a = hw * A_loc + a_loc); box_p (7, A''), dir_p (2, A'')
    feature-major in the conv-natural PERMUTED order (a'' = a_loc * HW +
    hw). Anchors/anchor_cls are canonical compile-time constants.

    Same math and bit-identical results as :func:`postprocess` — the wire
    layout is the point (see detector._wire_head: the permuted order lets
    stage 1 emit box/dir straight out of the head matmuls with zero
    relayout, ~13 ms cheaper per batch-8 than transposing (A, k) tensors,
    while `own` stays canonical so top-k tie-breaks match the reference
    exactly). Candidate indices are translated canonical -> permuted with
    two integer ops; everything downstream is anchor-order-agnostic."""
    top_scores, top_idx, cand_valid = _top_candidates(own, anchor_cls, config)

    a = own.shape[0]
    a_loc = config.anchors_per_loc
    hw = a // a_loc
    p_idx = (top_idx % a_loc) * hw + top_idx // a_loc

    def take_cols(t):
        rows, k = t.shape[0], p_idx.shape[0]
        flat_idx = (jnp.arange(rows, dtype=p_idx.dtype)[:, None] * a
                    + p_idx[None, :])
        return t.reshape(rows * a)[flat_idx.reshape(-1)].reshape(rows, k)

    boxes = decode_boxes(take_cols(box_p).T, anchors[top_idx])
    dir_cls = jnp.argmax(take_cols(dir_p), axis=0)
    cls_of = anchor_cls[top_idx]
    return _nms_and_pack(boxes, dir_cls, cls_of, top_scores, cand_valid,
                         config, nms_impl)


def postprocess(cls_logits, box_deltas, dir_logits, anchors, anchor_cls,
                config: PillarsConfig,
                nms_impl: str = "auto") -> Detections:
    """cls_logits (A, K), box_deltas (A, 7), dir_logits (A, 2);
    anchors (A, 7), anchor_cls (A,) int32 — both compile-time constants."""
    own = jnp.take_along_axis(cls_logits, anchor_cls[:, None], axis=1)[:, 0]
    top_scores, top_idx, cand_valid = _top_candidates(own, anchor_cls, config)

    boxes = decode_boxes(box_deltas[top_idx], anchors[top_idx])
    dir_cls = jnp.argmax(dir_logits[top_idx], axis=-1)
    cls_of = anchor_cls[top_idx]
    return _nms_and_pack(boxes, dir_cls, cls_of, top_scores, cand_valid,
                         config, nms_impl)


def resolve_nms_impl(nms_impl: str) -> str:
    """'auto' -> the measured winner per backend: the block-gated Pallas
    overlap kernel on TPU (full postprocess 31.2 vs 34.4 ms batch-8, same-day
    A/B 2026-08-18, scripts/probe_nms_pallas.py; keep sets identical), the
    XLA fixpoint elsewhere (interpret-mode Pallas is test-only slow)."""
    if nms_impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "fixpoint"
    if nms_impl not in ("fixpoint", "pallas"):
        raise ValueError(f"unknown nms_impl {nms_impl!r}; "
                         f"expected 'auto', 'fixpoint' or 'pallas'")
    return nms_impl


def _nms_and_pack(boxes, dir_cls, cls_of, top_scores, cand_valid,
                  config: PillarsConfig,
                  nms_impl: str = "auto") -> Detections:
    nms_impl = resolve_nms_impl(nms_impl)
    D = config.max_detections
    flip = (boxes[:, 6] > 0).astype(dir_cls.dtype) != dir_cls
    yaw = wrap_angle(boxes[:, 6] + jnp.where(flip, jnp.pi, 0.0))
    boxes = boxes.at[:, 6].set(yaw)

    # class-aware NMS: translate each class into its own distant BEV region
    span = (config.x_max - config.x_min) + (config.y_max - config.y_min)
    shifted = boxes.at[:, 0].add(cls_of.astype(boxes.dtype) * 4.0 * span)
    if nms_impl == "pallas":
        # block-gated Pallas overlap matrix + identical fixpoint sweep
        # (ops/nms_pallas.py; ulp-level fma caveat in its docstring);
        # class ids let it run class-blocked, where cross-class block
        # pairs skip by construction (class_gap guards the reorder's
        # disjointness premise against absurd decoded boxes)
        from tpu_pillars.ops.nms_pallas import rotated_nms_pallas

        keep = rotated_nms_pallas(shifted, top_scores, cand_valid,
                                  config.nms_iou_threshold,
                                  class_ids=cls_of,
                                  class_gap=4.0 * span)
    elif nms_impl == "fixpoint":
        keep = rotated_nms(shifted, top_scores, cand_valid,
                           config.nms_iou_threshold)
    else:
        raise ValueError(f"unknown nms_impl {nms_impl!r}; "
                         f"expected 'fixpoint' or 'pallas'")

    final_scores = jnp.where(keep, top_scores, -1.0)
    det_scores, det_idx = lax.top_k(final_scores, D)
    det_valid = det_scores > 0.0
    return Detections(
        boxes=boxes[det_idx] * det_valid[:, None],
        scores=jnp.where(det_valid, det_scores, 0.0),
        class_ids=cls_of[det_idx].astype(jnp.int32) * det_valid,
        valid=det_valid,
    )
