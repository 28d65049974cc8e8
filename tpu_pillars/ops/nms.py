"""On-device rotated NMS (SURVEY.md section 2 'Rotated NMS' — hot loop #4,
and section 7 hard part (a)).

Exact greedy NMS, reformulated for XLA: the K x K rotated-IoU matrix is
computed up front as one data-parallel VPU job (ops.iou), then the greedy
sweep is a `lax.scan` over boxes in descending-score order whose carry is the
suppression mask — K tiny vector steps instead of a host loop. Static shapes
throughout; ties break by lowest index, matching the NumPy reference's stable
descending sort, which keeps the two pipelines box-for-box identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpu_pillars.ops.iou import rotated_iou_bev_chunked


@partial(jax.jit, static_argnames=("iou_threshold",))
def rotated_nms(boxes, scores, valid, iou_threshold: float):
    """Greedy rotated BEV NMS over score-sorted boxes.

    boxes: (K, 7) sorted by descending score (caller guarantees order);
    scores: (K,) descending; valid: (K,) bool — padding / below-threshold
    slots, never kept and never suppressing.

    Returns keep: (K,) bool.
    """
    K = boxes.shape[0]
    iou = rotated_iou_bev_chunked(boxes, boxes, chunk=min(K, 256))  # (K, K)
    idx = jnp.arange(K)

    def step(suppressed, i):
        keep_i = valid[i] & ~suppressed[i]
        row = iou[i]
        newly = keep_i & (row > iou_threshold) & (idx > i)
        return suppressed | newly, keep_i

    _, keep = jax.lax.scan(step, jnp.zeros((K,), bool), idx)
    return keep
