#!/usr/bin/env python
"""Honest component split of the batch-4 train step (full config, TPU
defaults: fused front end, windowed Pallas assigner, remat).

Same nested-differencing methodology as probe_stage_split.py: each
sub-pipeline is ONE executable in a dependency-chained loop, so dispatch
overhead (measured by the null loop) cancels in differences.

  null     : dispatch floor
  assign   : windowed Pallas target assigner (gt -> Targets)
  emit     : sort + emit kernel (the train front half)
  fwdloss  : emit + fused PFN + scatter + RPN/head + assign + loss (VALUE
             only, no grad)
  full_f32 / full_bf16 : the whole train step (fwd + bwd + adamw)

  honest bwd+opt = full - fwdloss;  honest fwd-only = fwdloss - emit - assign
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
    from tpu_pillars.ops.assign_pallas import make_windowed_assigner
    from tpu_pillars.ops.fused_pfn import (
        emit_centered_table, pfn_train_from_table,
    )
    from tpu_pillars.ops.losses import detection_loss
    from tpu_pillars.ops.voxelize import scatter_to_bev
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
    d_pts = jax.device_put(pts)
    d_n = jax.device_put(npts)
    d_gb, d_gc, d_gv = map(jax.device_put, (gb, gc, gv))

    results = {}

    def run(tag, fn, args):
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, B, iters=12)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        return per * 1e3

    t_null = run("null", jax.jit(lambda x: x + 1.0),
                 (jnp.zeros((8, 8), jnp.float32),))

    assign_b = make_windowed_assigner(cfg, max_gt_per_class=16)
    t_assign = run("assign", jax.jit(
        lambda g, c, v: assign_b(g, c, v)), (d_gb, d_gc, d_gv))

    t_emit = run("emit", jax.jit(
        lambda p, n: emit_centered_table(p, n, cfg)), (d_pts, d_n))

    # forward + loss VALUE (mirrors make_train_step's loss_fn_fused)
    model = PointPillars(cfg, use_running_average=False, dtype=jnp.float32,
                         remat=True)

    def fwdloss(params, batch_stats, points, num_points):
        table, meta = emit_centered_table(points, num_points, cfg)
        p = params["pfn"]
        feats, pid, cnt, _, _ = jax.checkpoint(
            lambda w, s, b: pfn_train_from_table(table, meta, w, s, b, cfg)
        )(p["linear"]["kernel"], p["bn"]["scale"], p["bn"]["bias"])
        P = cfg.max_pillars
        feats, pid, cnt = feats[:, :P], pid[:, :P], cnt[:, :P]
        coords = jnp.stack([pid // cfg.grid_w, pid % cfg.grid_w], axis=-1)
        canvas = scatter_to_bev(feats, coords, cnt > 0.0, cfg)
        outputs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, canvas,
            method=PointPillars.detect_from_canvas, mutable=["batch_stats"])
        targets = assign_b(d_gb, d_gc, d_gv)
        losses = jax.vmap(
            lambda c, b, d, t: detection_loss(c, b, d, t, cfg)
        )(outputs.cls_logits.astype(jnp.float32),
          outputs.box_deltas.astype(jnp.float32),
          outputs.dir_logits.astype(jnp.float32), targets)
        return jnp.mean(losses.total)

    fwdloss_j = jax.jit(fwdloss)
    t_fwdloss = run("fwdloss", lambda p, n: fwdloss_j(
        state.params, state.batch_stats, p, n), (d_pts, d_n))

    # full steps: state-chained loop (the natural dependency chain)
    def time_full(tag, **kw):
        step = jax.jit(make_train_step(cfg, **kw))
        s, losses = step(state, batch)
        _ = float(losses.total)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            s, losses = step(s, batch)
        _ = float(losses.total)
        per = (time.perf_counter() - t0) / iters
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/step\n")
        return per * 1e3

    t_f32 = time_full("full_f32")
    t_bf16 = time_full("full_bf16", compute_dtype=jnp.bfloat16)
    time_full("full_f32_again")  # drift control

    results["honest_assign_ms"] = round(t_assign - t_null, 2)
    results["honest_emit_ms"] = round(t_emit - t_null, 2)
    results["honest_fwd_only_ms"] = round(t_fwdloss - t_emit - t_assign
                                          + t_null, 2)
    results["honest_bwd_opt_ms"] = round(t_f32 - t_fwdloss, 2)
    results["bf16_saves_ms"] = round(t_f32 - t_bf16, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
