"""On-device target assignment (SURVEY.md section 2 'Target assigner').

Class-matched anchor/GT assignment by rotated BEV IoU, entirely inside the
jitted train step (the reference does this per-sample in DataLoader workers —
hot loop in SURVEY.md 3.2). Padded GT slots (gt_valid False) never match.

Rules (SECOND/PointPillars lineage):
  * an anchor only matches GT boxes of its own class;
  * IoU >= matched_iou[class]  -> positive;  IoU < unmatched_iou[class] ->
    negative; in between -> ignored (zero cls weight);
  * every valid GT force-matches its best same-class anchor (so no GT is
    unassigned even when all IoUs are below threshold);
  * regression target = encode(gt, anchor); direction target = [gt yaw > 0].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tpu_pillars.config import PillarsConfig
from tpu_pillars.ops.box_coder import encode_boxes
from tpu_pillars.ops.iou import rotated_iou_bev_chunked


class Targets(NamedTuple):
    cls_onehot: jnp.ndarray   # (A, num_classes) one-hot (zeros for negatives)
    reg_targets: jnp.ndarray  # (A, 7)
    dir_targets: jnp.ndarray  # (A,) int32 in {0, 1}
    cls_weights: jnp.ndarray  # (A,) 1 for pos+neg, 0 for ignored
    reg_weights: jnp.ndarray  # (A,) 1 for pos
    num_pos: jnp.ndarray      # () float


def assign_targets(anchors, anchor_cls, gt_boxes, gt_cls, gt_valid,
                   config: PillarsConfig, iou_chunk: int = 8192) -> Targets:
    """anchors (A, 7), anchor_cls (A,) — compile-time constants;
    gt_boxes (G, 7), gt_cls (G,) int32, gt_valid (G,) bool — padded."""
    A = anchors.shape[0]
    G = gt_boxes.shape[0]

    iou = rotated_iou_bev_chunked(anchors, gt_boxes, chunk=iou_chunk)  # (A, G)
    same_class = anchor_cls[:, None] == gt_cls[None, :]
    eligible = same_class & gt_valid[None, :]
    iou = jnp.where(eligible, iou, -1.0)

    best_gt = jnp.argmax(iou, axis=1)                     # (A,)
    best_iou = jnp.take_along_axis(iou, best_gt[:, None], axis=1)[:, 0]

    matched_thr = jnp.asarray([c.matched_iou for c in config.classes])[anchor_cls]
    unmatched_thr = jnp.asarray([c.unmatched_iou for c in config.classes])[anchor_cls]

    pos = best_iou >= matched_thr
    neg = (best_iou >= 0.0) & (best_iou < unmatched_thr) | (best_iou < 0.0)
    # anchors with no eligible GT at all (best_iou == -1) are plain negatives

    # force-match: each valid GT claims its single best anchor
    best_anchor = jnp.argmax(iou, axis=0)                 # (G,)
    gt_best_iou = jnp.take_along_axis(iou, best_anchor[None, :], axis=0)[0]
    claim = gt_valid & (gt_best_iou > 0.0)
    forced = jnp.zeros((A,), bool).at[best_anchor].max(claim)
    forced_gt = jnp.full((A,), -1, jnp.int32).at[best_anchor].max(
        jnp.where(claim, jnp.arange(G, dtype=jnp.int32), -1)
    )
    pos = pos | forced
    neg = neg & ~pos
    assigned_gt = jnp.where(forced & (forced_gt >= 0), forced_gt, best_gt)

    matched = gt_boxes[assigned_gt]                       # (A, 7)
    reg_targets = encode_boxes(matched, anchors)
    dir_targets = (matched[:, 6] > 0.0).astype(jnp.int32)

    onehot = jax_nn_one_hot(gt_cls[assigned_gt], config.num_classes)
    cls_onehot = onehot * pos[:, None]

    cls_weights = (pos | neg).astype(jnp.float32)
    reg_weights = pos.astype(jnp.float32)
    return Targets(
        cls_onehot=cls_onehot.astype(jnp.float32),
        reg_targets=reg_targets * pos[:, None],
        dir_targets=dir_targets * pos,
        cls_weights=cls_weights,
        reg_weights=reg_weights,
        num_pos=jnp.sum(reg_weights),
    )


def jax_nn_one_hot(x, k):
    return (x[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
