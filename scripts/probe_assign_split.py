#!/usr/bin/env python
"""Windowed-assigner epilogue split (b4, full config, same-process).

The assigner reads ~15.3 ms of the 124.7 ms b4 train step (2026-08-19
re-split) while its Pallas IoU/argmax kernel is ~3 ms — this probe
differences the epilogue tiers to find where the rest goes. Suspect: the
GT-pick one-hot matmul materializes a (B, 144, 720k) f32 one-hot
(~1.7 GB at b4) that a VMEM-local formulation would never write to HBM.

Tiers (each a chained-loop jit returning scalar sums so stage outputs
still materialize where the real program materializes them):
  t_kernel   group_gt_by_class + windowed_best_iou
  t_codes    + finish_codes (threshold/force-match -> packed int32)
  t_flat     + the class-block -> flat transpose
  t_pick     + the one-hot GT pick matmul (HIGHEST)
  t_full     the full assign -> Targets
A/B/A: t_full runs first and last.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.ops.assign_pallas import (
        make_windowed_assigner, windowed_best_iou,
    )
    from tpu_pillars.ops.target_assigner import group_gt_by_class
    from tpu_pillars.train.loop import synthetic_batches
    from tpu_pillars.train.state import TrainConfig

    cfg = PillarsConfig()
    B = 4
    MAXG = 16
    batch = next(iter(synthetic_batches(
        cfg, TrainConfig(batch_size=B), seed=0, num_objects=40,
        points_per_object=300, clutter=60000)))
    gtb = jnp.asarray(batch.gt_boxes)
    gtc = jnp.asarray(batch.gt_classes)
    gtv = jnp.asarray(batch.gt_valid)

    C = cfg.num_classes
    Y = len(cfg.anchor_yaws)
    HW = cfg.feature_h * cfg.feature_w
    A = cfg.num_anchors
    from tpu_pillars.ops.anchors import make_anchors

    anchors_np, anchor_cls_np = make_anchors(cfg)
    slot_base = jnp.asarray(anchor_cls_np * MAXG)
    G_SLOTS = C * MAXG

    assign = make_windowed_assigner(cfg, max_gt_per_class=MAXG)
    # reach one tier at a time by re-deriving the epilogue inline (same
    # ops as make_windowed_assigner.assign; the full tier uses the real
    # function so any drift here can't misrank it)
    from tpu_pillars.ops.assign_pallas import make_windowed_assigner as _mka

    def group(gt_boxes, gt_cls, gt_valid):
        return jax.vmap(
            lambda b, c, v: group_gt_by_class(b, c, v, C, MAXG)
        )(gt_boxes, gt_cls, gt_valid)

    matched_thr = jnp.asarray([c.matched_iou for c in cfg.classes])
    unmatched_thr = jnp.asarray([c.unmatched_iou for c in cfg.classes])

    def codes_of(best, bestg, gt_val, gt_anchor, gv_c):
        def per_class(iou_b, gtb_, gval, ganc, gvc, m_thr, u_thr):
            Ac = iou_b.shape[0]
            Gc = gvc.shape[0]
            claim = gvc & (gval > 0.0)
            forced = jnp.zeros((Ac,), bool).at[ganc].max(claim)
            forced_gt = jnp.full((Ac,), -1, jnp.int32).at[ganc].max(
                jnp.where(claim, jnp.arange(Gc, dtype=jnp.int32), -1))
            pos = (iou_b >= m_thr) | forced
            neg = (iou_b < u_thr) & ~pos
            assigned = jnp.where(forced & (forced_gt >= 0), forced_gt, gtb_)
            return (assigned
                    | (pos.astype(jnp.int32) << 8)
                    | (neg.astype(jnp.int32) << 9))

        return jax.vmap(jax.vmap(per_class))(
            best, bestg, gt_val, gt_anchor, gv_c,
            jnp.broadcast_to(matched_thr, gv_c.shape[:2]),
            jnp.broadcast_to(unmatched_thr, gv_c.shape[:2]))

    def t_kernel(gt_boxes, gt_cls, gt_valid):
        gt_c, gv_c = group(gt_boxes, gt_cls, gt_valid)
        best, bestg, gt_val, gt_anchor = windowed_best_iou(gt_c, gv_c, cfg,
                                                           MAXG)
        return (jnp.sum(best) + jnp.sum(bestg) + jnp.sum(gt_val)
                + jnp.sum(gt_anchor))

    def t_codes(gt_boxes, gt_cls, gt_valid):
        gt_c, gv_c = group(gt_boxes, gt_cls, gt_valid)
        best, bestg, gt_val, gt_anchor = windowed_best_iou(gt_c, gv_c, cfg,
                                                           MAXG)
        code_c = codes_of(best, bestg, gt_val, gt_anchor, gv_c)
        return jnp.sum(code_c)

    def t_flat(gt_boxes, gt_cls, gt_valid):
        gt_c, gv_c = group(gt_boxes, gt_cls, gt_valid)
        best, bestg, gt_val, gt_anchor = windowed_best_iou(gt_c, gv_c, cfg,
                                                           MAXG)
        code_c = codes_of(best, bestg, gt_val, gt_anchor, gv_c)
        code = (code_c.reshape(B, C, HW, Y).transpose(0, 2, 1, 3)
                .reshape(B, A))
        return jnp.sum(code)

    def t_pick(gt_boxes, gt_cls, gt_valid):
        gt_c, gv_c = group(gt_boxes, gt_cls, gt_valid)
        best, bestg, gt_val, gt_anchor = windowed_best_iou(gt_c, gv_c, cfg,
                                                           MAXG)
        code_c = codes_of(best, bestg, gt_val, gt_anchor, gv_c)
        code = (code_c.reshape(B, C, HW, Y).transpose(0, 2, 1, 3)
                .reshape(B, A))
        slot = slot_base[None, :] + (code & 0xFF)
        gtf = gt_c.reshape(B, G_SLOTS, 7)
        onehot = (slot[:, None, :]
                  == jnp.arange(G_SLOTS)[None, :, None]).astype(jnp.float32)
        picked = jax.lax.dot_general(
            gtf, onehot, (((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(picked) + jnp.sum(code)

    def t_full(gt_boxes, gt_cls, gt_valid):
        t = assign(gt_boxes, gt_cls, gt_valid)
        return (jnp.sum(t.reg_targets) + jnp.sum(t.cls_onehot)
                + jnp.sum(t.num_pos) + jnp.sum(t.cls_weights))

    def null(gt_boxes, gt_cls, gt_valid):
        return jnp.sum(gt_boxes) * 0.0

    results = {}

    def run(tag, fn, iters=30):
        f = jax.jit(fn)
        np.asarray(f(gtb, gtc, gtv))  # compile
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(gtb, gtc, gtv)
        np.asarray(out)
        per = (time.perf_counter() - t0) / iters * 1e3
        results[tag] = round(per, 2)
        sys.stderr.write(f"{tag}: {per:.2f} ms\n")

    run("null", null)
    run("t_full_A", t_full)
    run("t_kernel", t_kernel)
    run("t_codes", t_codes)
    run("t_flat", t_flat)
    run("t_pick", t_pick)
    run("t_full_B", t_full)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
