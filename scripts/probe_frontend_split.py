#!/usr/bin/env python
"""Honest internal split of the fused serving front end (batch 8), plus a
single-executable whole-pipeline candidate.

probe_stage_split measured the b8 pipeline honestly: front end 18.75 ms
(55% of the loop), RPN+head 6.56, postprocess 2.6, and ~2.96 ms of
dispatch overhead PER executable — so the two-executable split pays ~5.9
ms/batch of dispatch. Two questions:

1. Where do the 18.75 front-end ms go? Nested single-executable
   pipelines (sort -> +emit -> +PFN -> +scatter), differenced, give
   per-kernel costs free of dispatch pollution.
2. Does ONE executable (model + optimization_barrier + postprocess — the
   build_forward_fn structure entry() already compiles at full size)
   recover a dispatch? The 9-min-compile/600x-slower monolith predates
   the barrier + wire-layout work; re-test before trusting the old no.
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
    from tpu_pillars.data.synthetic import make_scene
    from tpu_pillars.detector import (
        Detector, build_canvas_fn_batched, build_model_fn_batched,
        build_postprocess_fn, pack_detections,
    )
    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.fused_pfn import emit_centered_table, pillarize_pfn_fused
    from tpu_pillars.ops.emit_pallas import sort_points_by_pillar
    from tpu_pillars.ops.pfn_pallas import fold_bn
    from tpu_pillars.ops.voxelize import PillarBatch

    cfg = PillarsConfig()
    rng = np.random.default_rng(0)
    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    variables = model.init(jax.random.PRNGKey(0), dummy)
    det = Detector(cfg, variables)
    scenes = [make_scene(rng, cfg, num_objects=40, points_per_object=300,
                         clutter=90000) for _ in range(8)]
    padded = [det.pad_points(s.points) for s in scenes]
    d_pts = jax.device_put(np.stack([p for p, _ in padded]))
    d_n = jax.device_put(np.asarray([c for _, c in padded]))

    p = variables["params"]["pfn"]
    bs = variables["batch_stats"]["pfn"]["bn"]
    w, b = fold_bn(p["linear"]["kernel"], p["bn"]["scale"],
                   p["bn"]["bias"], bs["mean"], bs["var"])

    results = {}

    def run(tag, fn, args=(None,)):
        if args == (None,):
            args = (d_pts, d_n)
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, 8)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        return per * 1e3

    t_null = run("null", jax.jit(lambda x: x + 1.0),
                 (jnp.zeros((8, 8), jnp.float32),))
    t_sort = run("sort", jax.jit(
        lambda pts, n: sort_points_by_pillar(pts, n, cfg)))
    t_table = run("table", jax.jit(
        lambda pts, n: emit_centered_table(pts, n, cfg)))
    t_feats = run("feats", jax.jit(
        lambda pts, n: pillarize_pfn_fused(pts, n, w, b, cfg)))
    t_canvas = run("canvas", jax.jit(
        lambda pts, n: build_canvas_fn_batched(cfg)(det.variables, pts, n)))

    results["honest_sort_ms"] = round(t_sort - t_null, 2)
    results["honest_emit_ms"] = round(t_table - t_sort, 2)
    results["honest_pfn_ms"] = round(t_feats - t_table, 2)
    results["honest_scatter_ms"] = round(t_canvas - t_feats, 2)

    # --- single-executable pipeline (barrier between model and post) ---
    model_fn_b = build_model_fn_batched(cfg)
    post_fn = build_postprocess_fn(cfg)
    post_packed_b = jax.vmap(
        lambda o, bx, d: pack_detections(post_fn(o, bx, d)))
    onejit = jax.jit(lambda v, pts, n: post_packed_b(
        *jax.lax.optimization_barrier(model_fn_b(v, pts, n))))
    t_one = run("onejit_full", lambda pts, n: onejit(det.variables, pts, n))

    t_two = run("twoexec_full", lambda pts, n: det._post_packed_batch(
        *det._model_batch(det.variables, pts, n)))
    results["onejit_vs_twoexec_ms"] = round(t_one - t_two, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
