#!/usr/bin/env python
"""Same-process A/B: XLA scatter vs the differentiable ring scatter
(scatter_to_bev_ring_diff) inside the b4 full-config train grad
computation. Order: xla, ring, xla-again (drift control)."""
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
    from tpu_pillars.ops.bev_pallas import scatter_to_bev_ring_diff
    from tpu_pillars.ops.fused_pfn import (
        emit_centered_table, pfn_train_from_table,
    )
    from tpu_pillars.ops.losses import detection_loss_fm
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
    d_pts, d_n = jax.device_put(pts), jax.device_put(npts)
    d_gb, d_gc, d_gv = map(jax.device_put, (gb, gc, gv))
    params, batch_stats = state.params, state.batch_stats

    model = PointPillars(cfg, use_running_average=False, dtype=jnp.float32,
                         remat=True)
    assign_b = make_windowed_assigner(cfg, max_gt_per_class=16)

    def make_loss(scatter_kind):
        def loss(params, points, num_points):
            table, meta = emit_centered_table(points, num_points, cfg)
            p = params["pfn"]
            feats, pid, cnt, _, _ = jax.checkpoint(
                lambda w, s, b: pfn_train_from_table(table, meta, w, s, b,
                                                     cfg)
            )(p["linear"]["kernel"], p["bn"]["scale"], p["bn"]["bias"])
            P = cfg.max_pillars
            feats, pid, cnt = feats[:, :P], pid[:, :P], cnt[:, :P]
            mask = cnt > 0.0
            if scatter_kind == "ring":
                canvas = scatter_to_bev_ring_diff(feats, pid, mask, cfg)
            else:
                coords = jnp.stack([pid // cfg.grid_w, pid % cfg.grid_w],
                                   axis=-1)
                canvas = scatter_to_bev(feats, coords, mask, cfg)
            feat, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, canvas,
                method=PointPillars.features_from_canvas,
                mutable=["batch_stats"])
            cls_fm, box_fm, dir_fm = feature_major_head(
                params["head"], feat, cfg.num_classes, cfg.anchors_per_loc)
            targets = assign_b(d_gb, d_gc, d_gv)
            losses = jax.vmap(
                lambda c, b, d, t: detection_loss_fm(c, b, d, t, cfg)
            )(cls_fm, box_fm, dir_fm, targets)
            return jnp.mean(losses.total)
        return loss

    results = {}

    def run(tag, fn, args):
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, B, iters=12)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")

    run("null", jax.jit(lambda x: x + 1.0), (jnp.zeros((8, 8), jnp.float32),))
    g_xla = jax.jit(jax.grad(make_loss("xla")))
    g_ring = jax.jit(jax.grad(make_loss("ring")))
    run("grads_xla_a", lambda p, n: g_xla(params, p, n), (d_pts, d_n))
    run("grads_ring", lambda p, n: g_ring(params, p, n), (d_pts, d_n))
    run("grads_xla_b", lambda p, n: g_xla(params, p, n), (d_pts, d_n))

    lo = float(jax.jit(make_loss("xla"))(params, d_pts, d_n))
    ln = float(jax.jit(make_loss("ring"))(params, d_pts, d_n))
    results["loss_xla"], results["loss_ring"] = lo, ln
    print(json.dumps(results))


if __name__ == "__main__":
    main()
