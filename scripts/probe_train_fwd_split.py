#!/usr/bin/env python
"""Drill into the b4 train forward (honest fwd-only ~55 ms vs ~15-20 ms of
conv flops): canvas-build vs train-mode convs vs loss, nested differencing.

  null      : dispatch floor
  canvas    : emit + (remat'd) pfn_train_from_table + XLA scatter
  convs     : canvas + detect_from_canvas (train-mode BN)
  convs_inf : canvas + detect_from_canvas with use_running_average=True
              (same flops, no batch-stat reductions) — isolates BN cost
  loss      : full fwdloss (probe_train_split's) re-measured as control
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
    from tpu_pillars.train import TrainBatch, TrainConfig, create_train_state

    cfg = PillarsConfig()
    B = 4
    rng = np.random.default_rng(0)
    scenes = [make_scene(rng, cfg, num_objects=24, points_per_object=120,
                         clutter=60000) for _ in range(B)]
    tcfg = TrainConfig(batch_size=B, max_gt_boxes=64, total_steps=100)
    pts, npts, gb, gc, gv = scenes_to_train_batch(scenes, cfg,
                                                  tcfg.max_gt_boxes)
    state = create_train_state(cfg, tcfg)
    d_pts = jax.device_put(pts)
    d_n = jax.device_put(npts)
    d_gb, d_gc, d_gv = map(jax.device_put, (gb, gc, gv))
    params, batch_stats = state.params, state.batch_stats

    model_tr = PointPillars(cfg, use_running_average=False,
                            dtype=jnp.float32, remat=True)
    model_inf = PointPillars(cfg, use_running_average=True,
                             dtype=jnp.float32, remat=True)
    assign_b = make_windowed_assigner(cfg, max_gt_per_class=16)

    def canvas_of(params, points, num_points):
        table, meta = emit_centered_table(points, num_points, cfg)
        p = params["pfn"]
        feats, pid, cnt, _, _ = jax.checkpoint(
            lambda w, s, b: pfn_train_from_table(table, meta, w, s, b, cfg)
        )(p["linear"]["kernel"], p["bn"]["scale"], p["bn"]["bias"])
        P = cfg.max_pillars
        feats, pid, cnt = feats[:, :P], pid[:, :P], cnt[:, :P]
        coords = jnp.stack([pid // cfg.grid_w, pid % cfg.grid_w], axis=-1)
        return scatter_to_bev(feats, coords, cnt > 0.0, cfg)

    def outputs_of(model, params, batch_stats, points, num_points):
        canvas = canvas_of(params, points, num_points)
        outputs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, canvas,
            method=PointPillars.detect_from_canvas, mutable=["batch_stats"])
        return outputs

    def fwdloss(params, batch_stats, points, num_points):
        outputs = outputs_of(model_tr, params, batch_stats, points,
                             num_points)
        targets = assign_b(d_gb, d_gc, d_gv)
        losses = jax.vmap(
            lambda c, b, d, t: detection_loss(c, b, d, t, cfg)
        )(outputs.cls_logits.astype(jnp.float32),
          outputs.box_deltas.astype(jnp.float32),
          outputs.dir_logits.astype(jnp.float32), targets)
        return jnp.mean(losses.total)

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
    canvas_j = jax.jit(canvas_of)
    t_canvas = run("canvas", lambda p, n: canvas_j(params, p, n),
                   (d_pts, d_n))
    conv_j = jax.jit(lambda p, n: outputs_of(model_tr, params, batch_stats,
                                             p, n))
    t_convs = run("convs_train", conv_j, (d_pts, d_n))
    convi_j = jax.jit(lambda p, n: outputs_of(model_inf, params, batch_stats,
                                              p, n))
    t_convsi = run("convs_inf", convi_j, (d_pts, d_n))
    fl_j = jax.jit(lambda p, n: fwdloss(params, batch_stats, p, n))
    t_fl = run("fwdloss", fl_j, (d_pts, d_n))

    results["honest_canvas_ms"] = round(t_canvas - t_null, 2)
    results["honest_convs_train_ms"] = round(t_convs - t_canvas, 2)
    results["bn_stats_cost_ms"] = round(t_convs - t_convsi, 2)
    results["honest_loss_plus_assign_ms"] = round(t_fl - t_convs, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
