#!/usr/bin/env python
"""Class-blocked GT pick vs flat 144-slot pick (b4, full config, A/B/A).

The flat pick builds a (B, 144, 720k) f32 one-hot (~1.7 GB at b4) as a
dot_general operand; but each anchor's class is STATIC, so the pick only
ever selects among the 16 slots of the anchor's own class. Doing the pick
class-blocked — one-hot (B, C, 16, Ac) (~184 MB), batched dot over (B, C),
then ONE (B,7) class-block->flat transpose (~80 MB) — should cut the
epilogue's HBM traffic ~9x. Exactness is unchanged: still a HIGHEST-
precision one-hot matmul with exactly one nonzero per output column, so
`picked` must be BIT-IDENTICAL; this probe asserts that before timing.

A/B/A: full current assign, class-blocked variant, full current again.
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
    from tpu_pillars.ops.anchors import make_anchors
    from tpu_pillars.ops.assign_pallas import (
        make_windowed_assigner, windowed_best_iou,
    )
    from tpu_pillars.ops.target_assigner import Targets, group_gt_by_class
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
    G_SLOTS = C * MAXG

    anchors_np, anchor_cls_np = make_anchors(cfg)
    slot_base = jnp.asarray(anchor_cls_np * MAXG)
    matched_thr = jnp.asarray([c.matched_iou for c in cfg.classes])
    unmatched_thr = jnp.asarray([c.unmatched_iou for c in cfg.classes])
    anchor_ch = jnp.asarray(anchors_np.T)
    anchor_onehot = jnp.asarray(
        (anchor_cls_np[None, :] == np.arange(C)[:, None]).astype(np.float32))

    assign = make_windowed_assigner(cfg, max_gt_per_class=MAXG)

    def group(gt_boxes, gt_cls, gt_valid):
        return jax.vmap(
            lambda b, c, v: group_gt_by_class(b, c, v, C, MAXG)
        )(gt_boxes, gt_cls, gt_valid)

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

    def epilogue_from_picked(picked, code):
        posb = (code & (1 << 8)) != 0
        negb = (code & (1 << 9)) != 0
        posf = posb.astype(jnp.float32)
        px, py, pz, pw, plen, ph, pt = [picked[:, k, :] for k in range(7)]
        xa, ya, za, wa, la, ha, ta = [anchor_ch[k][None, :] for k in range(7)]
        d = jnp.sqrt(wa * wa + la * la)
        reg = jnp.stack([
            (px - xa) / d,
            (py - ya) / d,
            (pz - za) / ha,
            jnp.log(pw / wa),
            jnp.log(plen / la),
            jnp.log(ph / ha),
            pt - ta,
        ], axis=1)
        reg = jnp.where(posb[:, None, :], reg, 0.0)
        return Targets(
            cls_onehot=anchor_onehot[None] * posf[:, None, :],
            reg_targets=reg,
            dir_targets=((pt > 0.0) & posb).astype(jnp.int32),
            cls_weights=(posb | negb).astype(jnp.float32),
            reg_weights=posf,
            num_pos=jnp.sum(posf, axis=1),
        )

    def assign_cb(gt_boxes, gt_cls, gt_valid):
        """Current assign with the pick done class-blocked."""
        gt_c, gv_c = group(gt_boxes, gt_cls, gt_valid)
        best, bestg, gt_val, gt_anchor = windowed_best_iou(gt_c, gv_c, cfg,
                                                           MAXG)
        code_c = codes_of(best, bestg, gt_val, gt_anchor, gv_c)
        code = (code_c.reshape(B, C, HW, Y).transpose(0, 2, 1, 3)
                .reshape(B, A))
        gidx = code_c & 0xFF                               # (B, C, Ac)
        onehot_c = (gidx[:, :, None, :]
                    == jnp.arange(MAXG)[None, None, :, None]
                    ).astype(jnp.float32)                  # (B, C, 16, Ac)
        picked_c = jax.lax.dot_general(
            gt_c, onehot_c, (((2,), (2,)), ((0, 1), (0, 1))),
            precision=jax.lax.Precision.HIGHEST)           # (B, C, 7, Ac)
        picked = (picked_c.reshape(B, C, 7, HW, Y)
                  .transpose(0, 2, 3, 1, 4).reshape(B, 7, A))
        return epilogue_from_picked(picked, code)

    # ---- bit-equality check before timing
    t_ref = jax.jit(assign)(gtb, gtc, gtv)
    t_cb = jax.jit(assign_cb)(gtb, gtc, gtv)
    for name in Targets._fields:
        a = np.asarray(getattr(t_ref, name))
        b = np.asarray(getattr(t_cb, name))
        assert a.dtype == b.dtype and np.array_equal(a, b), (
            f"{name} mismatch: {np.sum(a != b)} cells")
    sys.stderr.write("bit-equality: OK (all Targets fields identical)\n")

    def sum_targets(t):
        return (jnp.sum(t.reg_targets) + jnp.sum(t.cls_onehot)
                + jnp.sum(t.num_pos) + jnp.sum(t.cls_weights))

    results = {}

    def run(tag, fn, iters=30):
        f = jax.jit(lambda b_, c_, v_: sum_targets(fn(b_, c_, v_)))
        np.asarray(f(gtb, gtc, gtv))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(gtb, gtc, gtv)
        np.asarray(out)
        per = (time.perf_counter() - t0) / iters * 1e3
        results[tag] = round(per, 2)
        sys.stderr.write(f"{tag}: {per:.2f} ms\n")

    run("full_A", assign)
    run("full_cb", assign_cb)
    run("full_B", assign)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
