#!/usr/bin/env python
"""Locate the cost inside the LIVE fused train forward (b4, f32): nested
sub-pipelines that mirror make_train_step's loss_fn_fused exactly (ring
train scatter, train-mode BN, feature-major head + loss), each returning a
SCALAR reduction (no materialization trap). Differences between adjacent
tiers are the honest per-tier costs:

  null   -> dispatch floor
  emit   -> sort + emit table
  pfn    -> + pfn_train_from_table (checkpointed, as live)
  canvas -> + scatter_to_bev_train_auto
  rpn    -> + features_from_canvas (train mode, mutable BN)
  loss   -> + feature_major_head + windowed assign + detection_loss_fm
  grad   -> value_and_grad of the live loss (fwd+bwd)
  step   -> the full jitted train step (state-chained)
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

    from bench_extra import _device_loop_rate
    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
    from tpu_pillars.models import PointPillars
    from tpu_pillars.models.head import feature_major_head
    from tpu_pillars.ops.assign_pallas import make_windowed_assigner
    from tpu_pillars.ops.bev_pallas import scatter_to_bev_train_auto
    from tpu_pillars.ops.fused_pfn import (
        emit_centered_table, pfn_train_from_table,
    )
    from tpu_pillars.ops.losses import detection_loss_fm
    from tpu_pillars.train import (
        TrainBatch, TrainConfig, create_train_state, make_train_step,
    )

    cfg = PillarsConfig()
    B = 4
    rng = np.random.default_rng(0)
    scenes = [make_scene(rng, cfg, num_objects=24, points_per_object=120,
                         clutter=60000) for _ in range(B)]
    tcfg = TrainConfig(batch_size=B, max_gt_boxes=64, total_steps=100)
    pts, npts, gb, gc, gv = scenes_to_train_batch(scenes, cfg,
                                                  tcfg.max_gt_boxes)
    batch = TrainBatch(pts, npts, gb, gc, gv)
    state = create_train_state(cfg, tcfg)
    d_pts, d_n = jax.device_put(pts), jax.device_put(npts)
    d_gb, d_gc, d_gv = map(jax.device_put, (gb, gc, gv))

    model = PointPillars(cfg, use_running_average=False,
                         dtype=jnp.float32, remat=True)
    assign_b = make_windowed_assigner(cfg, max_gt_per_class=16)
    P = cfg.max_pillars

    def tier_emit(params, bstats, points, num_points):
        table, meta = emit_centered_table(points, num_points, cfg)
        return jnp.sum(table) + jnp.sum(meta)

    def _pfn(params, points, num_points):
        table, meta = emit_centered_table(points, num_points, cfg)
        p = params["pfn"]
        fn = jax.checkpoint(lambda w, s, b: pfn_train_from_table(
            table, meta, w, s, b, cfg))
        feats, pid, cnt, bm, bv = fn(
            p["linear"]["kernel"], p["bn"]["scale"], p["bn"]["bias"])
        return feats[:, :P], pid[:, :P], cnt[:, :P]

    def tier_pfn(params, bstats, points, num_points):
        feats, pid, cnt = _pfn(params, points, num_points)
        return jnp.sum(feats)

    def _canvas(params, points, num_points):
        feats, pid, cnt = _pfn(params, points, num_points)
        return scatter_to_bev_train_auto(feats, pid, cnt > 0.0, cfg)

    def tier_canvas(params, bstats, points, num_points):
        return jnp.sum(_canvas(params, points, num_points))

    def _rpn(params, bstats, points, num_points):
        canvas = _canvas(params, points, num_points)
        feat, _ = model.apply(
            {"params": params, "batch_stats": bstats}, canvas,
            method=PointPillars.features_from_canvas,
            mutable=["batch_stats"])
        return feat

    def tier_rpn(params, bstats, points, num_points):
        return jnp.sum(_rpn(params, bstats, points, num_points))

    def tier_loss(params, bstats, points, num_points):
        feat = _rpn(params, bstats, points, num_points)
        cls_fm, box_fm, dir_fm = feature_major_head(
            params["head"], feat, cfg.num_classes, cfg.anchors_per_loc,
            dtype=jnp.float32)
        targets = assign_b(d_gb, d_gc, d_gv)
        losses = jax.vmap(
            lambda c, b, d, t: detection_loss_fm(c, b, d, t, cfg)
        )(cls_fm, box_fm, dir_fm, targets)
        return jnp.mean(losses.total)

    tier_grad_fn = jax.grad(tier_loss)

    results = {}

    def run(tag, fn, args, iters=12):
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, B, iters=iters)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        return per * 1e3

    t_null = run("null", jax.jit(lambda x: x + 1.0),
                 (jnp.zeros((8, 8), jnp.float32),))
    tiers = [("emit", tier_emit), ("pfn", tier_pfn),
             ("canvas", tier_canvas), ("rpn", tier_rpn),
             ("loss", tier_loss)]
    prev = t_null
    for tag, f in tiers:
        fj = jax.jit(f)
        t = run(tag, lambda p_, n_, fj=fj: fj(
            state.params, state.batch_stats, p_, n_), (d_pts, d_n))
        results[f"tier_{tag}_ms"] = round(t - prev, 2)
        prev = t

    gj = jax.jit(lambda p_, n_: jax.tree.map(
        jnp.sum, tier_grad_fn(state.params, state.batch_stats, p_, n_)))
    t_grad = run("grad", gj, (d_pts, d_n))
    results["tier_bwd_ms"] = round(t_grad - prev, 2)

    step = jax.jit(make_train_step(cfg))
    s, losses = step(state, batch)
    _ = float(losses.total)
    t0 = time.perf_counter()
    for _ in range(10):
        s, losses = step(s, batch)
    _ = float(losses.total)
    results["full_step_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)
    sys.stderr.write(f"full_step: {results['full_step_ms']} ms\n")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
