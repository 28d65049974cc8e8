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

import jax
import jax.numpy as jnp

from tpu_pillars.config import PillarsConfig
from tpu_pillars.ops.box_coder import encode_boxes
from tpu_pillars.ops.iou import (
    rotated_iou_bev_chunked, rotated_iou_bev_colchunked,
)


class Targets(NamedTuple):
    """Per-anchor training targets, FEATURE-MAJOR: the 720k-anchor axis
    rides the TPU lane dimension. Anchor-major (A, k) layouts tile to
    (8, 128) vregs with k<=9 live lanes — 14x+ padded HBM traffic on every
    loss pass (ops/losses.py runs the same orientation)."""

    cls_onehot: jnp.ndarray   # (num_classes, A) one-hot (zeros for negatives)
    reg_targets: jnp.ndarray  # (7, A)
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

    # non-positive anchors encode against THEMSELVES (residual 0): padded
    # all-zero GT rows would otherwise produce log(0)/0-div NaNs that poison
    # the loss even under a zero regression weight (0 * nan = nan)
    matched = jnp.where(pos[:, None], gt_boxes[assigned_gt], anchors)
    reg_targets = encode_boxes(matched, anchors)
    dir_targets = (matched[:, 6] > 0.0).astype(jnp.int32) * pos

    onehot_t = (gt_cls[assigned_gt][None, :]
                == jnp.arange(config.num_classes)[:, None])   # (C, A)
    cls_onehot = onehot_t & pos[None, :]

    cls_weights = (pos | neg).astype(jnp.float32)
    reg_weights = pos.astype(jnp.float32)
    return Targets(
        cls_onehot=cls_onehot.astype(jnp.float32),
        reg_targets=reg_targets.T * pos[None, :],
        dir_targets=dir_targets * pos,
        cls_weights=cls_weights,
        reg_weights=reg_weights,
        num_pos=jnp.sum(reg_weights),
    )


def jax_nn_one_hot(x, k):
    return (x[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Class-blocked assigner: anchors only ever match same-class GT, so instead
# of the dense (A, G) IoU (A=720k x G=64 mixed classes), group GT by class
# (static per-class capacity) and assign each class's anchor block against
# its own GT: sum_c A_c x G_c pairs — 4x less IoU work at G_c = G/4, and no
# wasted same_class masking. Bit-identical to assign_targets whenever no
# class exceeds `max_gt_per_class`.
# ---------------------------------------------------------------------------


def group_gt_by_class(gt_boxes, gt_cls, gt_valid, num_classes: int,
                      cap: int):
    """(G, 7) mixed -> per-class (C, cap, 7) boxes + (C, cap) validity.
    GT beyond a class's capacity are dropped deterministically (input order).
    """
    G = gt_boxes.shape[0]
    onehot = (gt_cls[:, None] == jnp.arange(num_classes)[None, :]) & gt_valid[:, None]
    rank_all = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - onehot.astype(jnp.int32)
    rank = jnp.take_along_axis(rank_all, gt_cls[:, None], axis=1)[:, 0]
    ok = gt_valid & (rank < cap)
    dest = jnp.where(ok, gt_cls * cap + rank, num_classes * cap)
    boxes = jnp.zeros((num_classes * cap + 1, 7), gt_boxes.dtype).at[dest].set(gt_boxes)
    valid = jnp.zeros((num_classes * cap + 1,), bool).at[dest].set(ok)
    return (boxes[:-1].reshape(num_classes, cap, 7),
            valid[:-1].reshape(num_classes, cap))


def make_classwise_assigner(config: PillarsConfig, max_gt_per_class: int = 16,
                            iou_chunk: int = 16384, band_cells: int = 0):
    """Returns assign(gt_boxes (G,7), gt_cls (G,), gt_valid (G,)) -> Targets
    in the flat anchor layout (same contract as assign_targets).

    band_cells > 0 enables BANDED assignment: each GT's IoU is computed only
    against the (band x band x yaws) window of anchors around its center —
    exact for boxes whose reach fits the band (48 cells covers ~2x the
    largest canonical class diagonal at 1 m feature stride), since
    out-of-window pairs read IoU 0, their true value under that bound.

    MEASURED OFF by default: the window machinery (vmap of dynamic_slice /
    dynamic_update_slice over 16 GT x 9 classes) lowers to XLA gathers and
    scatters that cost more than the 17x pair reduction saves — 122 ms vs
    74 ms for the dense path at batch 4 on v5e. The dense (G_c, A_c)
    formulation is pure VPU compute (~27 ms of rotated-IoU flops) and
    remains the default; a Pallas windowed assigner with real sequential
    slices is the remaining idea if this ever needs to shrink."""
    from tpu_pillars.ops.anchors import make_anchors
    from tpu_pillars.ops.iou import rotated_iou_bev_paired

    anchors_np, anchor_cls_np = make_anchors(config)
    C = config.num_classes
    Y = len(config.anchor_yaws)
    Hf, Wf = config.feature_h, config.feature_w
    HW = Hf * Wf
    A = config.num_anchors
    # (A, 7) laid out (HW, C, Y) -> (C, HW*Y, 7) class blocks
    anchors_by_class = jnp.asarray(
        anchors_np.reshape(HW, C, Y, 7).transpose(1, 0, 2, 3).reshape(C, HW * Y, 7))
    matched_thr = jnp.asarray([c.matched_iou for c in config.classes])
    unmatched_thr = jnp.asarray([c.unmatched_iou for c in config.classes])
    Bc = min(band_cells, Hf, Wf)
    stride_x = config.voxel_x * config.head_stride
    stride_y = config.voxel_y * config.head_stride

    def banded_iou(anchors_c, gt_c):
        """(Ac, 7) anchors of one class, (Gc, 7) GT -> dense (Gc, Ac) IoU
        with zeros outside each GT's anchor window."""
        grid = anchors_c.reshape(Hf, Wf, Y, 7)

        def window(g):
            r0 = jnp.clip(((g[1] - config.y_min) / stride_y).astype(jnp.int32)
                          - Bc // 2, 0, Hf - Bc)
            c0 = jnp.clip(((g[0] - config.x_min) / stride_x).astype(jnp.int32)
                          - Bc // 2, 0, Wf - Bc)
            win = jax.lax.dynamic_slice(grid, (r0, c0, 0, 0), (Bc, Bc, Y, 7))
            return win.reshape(Bc * Bc * Y, 7), r0, c0

        wins, r0s, c0s = jax.vmap(window)(gt_c)          # (Gc, K, 7)
        iou_w = rotated_iou_bev_paired(gt_c, wins)       # (Gc, K)

        def paste(row, r0, c0):
            z = jnp.zeros((Hf, Wf, Y), row.dtype)
            return jax.lax.dynamic_update_slice(
                z, row.reshape(Bc, Bc, Y), (r0, c0, 0))

        dense = jax.vmap(paste)(iou_w, r0s, c0s)
        return dense.reshape(gt_c.shape[0], Hf * Wf * Y)

    def assign_one(anchors_c, gt_c, gv_c, m_thr, u_thr):
        # (Gc, Ac) orientation throughout: the 80k-anchor axis rides the TPU
        # lane dimension. The transposed (Ac, Gc) layout puts Gc=16 in
        # lanes — 8x vreg padding on every one of the argmax/max/compare
        # passes below (measured: 74 ms -> ~30 ms for this block, batch 4).
        if Bc > 0:
            iou = banded_iou(anchors_c, gt_c)
        else:
            iou = rotated_iou_bev_colchunked(gt_c, anchors_c, chunk=iou_chunk)
        iou = jnp.where(gv_c[:, None], iou, -1.0)
        Gc, Ac = iou.shape
        best_gt = jnp.argmax(iou, axis=0)                       # (Ac,)
        best_iou = jnp.max(iou, axis=0)
        pos = best_iou >= m_thr
        best_anchor = jnp.argmax(iou, axis=1)                   # (Gc,)
        gt_best_iou = jnp.max(iou, axis=1)
        claim = gv_c & (gt_best_iou > 0.0)
        forced = jnp.zeros((Ac,), bool).at[best_anchor].max(claim)
        forced_gt = jnp.full((Ac,), -1, jnp.int32).at[best_anchor].max(
            jnp.where(claim, jnp.arange(Gc, dtype=jnp.int32), -1))
        pos = pos | forced
        neg = (best_iou < u_thr) & ~pos
        assigned = jnp.where(forced & (forced_gt >= 0), forced_gt, best_gt)
        # see assign_targets: encode non-positives against themselves so
        # padded zero GT rows can't inject NaNs
        matched = jnp.where(pos[:, None], gt_c[assigned], anchors_c)
        reg = encode_boxes(matched, anchors_c)
        dirt = (matched[:, 6] > 0.0).astype(jnp.int32) * pos
        return pos, neg, reg, dirt

    assign_vc = jax.vmap(assign_one)

    def assign(gt_boxes, gt_cls, gt_valid) -> Targets:
        gt_c, gv_c = group_gt_by_class(gt_boxes, gt_cls, gt_valid, C,
                                       max_gt_per_class)
        pos_c, neg_c, reg_c, dir_c = assign_vc(
            anchors_by_class, gt_c, gv_c, matched_thr, unmatched_thr)

        def unblock(x):  # (C, HW*Y, ...) -> (A, ...)
            rest = x.shape[2:]
            return (x.reshape((C, HW, Y) + rest)
                     .transpose((1, 0, 2) + tuple(3 + i for i in range(len(rest))))
                     .reshape((A,) + rest))

        pos = unblock(pos_c)
        neg = unblock(neg_c)
        reg = unblock(reg_c)
        dirt = unblock(dir_c)
        anchor_cls = jnp.asarray(anchor_cls_np)
        cls_onehot = ((anchor_cls[None, :] == jnp.arange(C)[:, None])
                      & pos[None, :]).astype(jnp.float32)     # (C, A)
        return Targets(
            cls_onehot=cls_onehot,
            reg_targets=reg.T * pos[None, :],
            dir_targets=dirt * pos,
            cls_weights=(pos | neg).astype(jnp.float32),
            reg_weights=pos.astype(jnp.float32),
            num_pos=jnp.sum(pos.astype(jnp.float32)),
        )

    return assign
