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


def postprocess(cls_logits, box_deltas, dir_logits, anchors, anchor_cls,
                config: PillarsConfig) -> Detections:
    """cls_logits (A, K), box_deltas (A, 7), dir_logits (A, 2);
    anchors (A, 7), anchor_cls (A,) int32 — both compile-time constants."""
    A = cls_logits.shape[0]
    K = config.pre_nms_top_k
    D = config.max_detections

    own = jnp.take_along_axis(cls_logits, anchor_cls[:, None], axis=1)[:, 0]
    scores = jax.nn.sigmoid(own)

    thresholds = jnp.asarray(
        [c.score_threshold for c in config.classes], cls_logits.dtype
    )[anchor_cls]
    passing = scores >= thresholds
    masked = jnp.where(passing, scores, -1.0)

    top_scores, top_idx = lax.top_k(masked, K)       # ties -> lowest index
    cand_valid = top_scores > 0.0

    boxes = decode_boxes(box_deltas[top_idx], anchors[top_idx])
    dir_cls = jnp.argmax(dir_logits[top_idx], axis=-1)
    flip = (boxes[:, 6] > 0).astype(dir_cls.dtype) != dir_cls
    yaw = wrap_angle(boxes[:, 6] + jnp.where(flip, jnp.pi, 0.0))
    boxes = boxes.at[:, 6].set(yaw)

    # class-aware NMS: translate each class into its own distant BEV region
    cls_of = anchor_cls[top_idx]
    span = (config.x_max - config.x_min) + (config.y_max - config.y_min)
    shifted = boxes.at[:, 0].add(cls_of.astype(boxes.dtype) * 4.0 * span)
    keep = rotated_nms(shifted, top_scores, cand_valid, config.nms_iou_threshold)

    final_scores = jnp.where(keep, top_scores, -1.0)
    det_scores, det_idx = lax.top_k(final_scores, D)
    det_valid = det_scores > 0.0
    return Detections(
        boxes=boxes[det_idx] * det_valid[:, None],
        scores=jnp.where(det_valid, det_scores, 0.0),
        class_ids=cls_of[det_idx].astype(jnp.int32) * det_valid,
        valid=det_valid,
    )
