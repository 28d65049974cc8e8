#!/usr/bin/env python
"""Resolve knob choices that flip between processes: alternate the two
candidates repeatedly in ONE process and decide by the median of paired
deltas (each pair adjacent in time, so slow drift cancels). Candidates:
emit wblk 256 vs 512 (measured 10.98<12.83 one day, 8.41<9.60 REVERSED the
next) and ring whalf 400 vs 800 (7.75<7.83 then 8.94>6.90).
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
    from tpu_pillars.detector import Detector
    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.bev_pallas import scatter_to_bev_ring
    from tpu_pillars.ops.fused_pfn import (
        emit_centered_table, pillarize_pfn_fused,
    )
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
    feats_fn = jax.jit(lambda pts, n: pillarize_pfn_fused(pts, n, w, b, cfg))
    feats, pid, mask = feats_fn(d_pts, d_n)
    feats, pid, mask = map(jax.device_put, map(np.asarray,
                                               (feats, pid, mask)))

    def timed(fn, args):
        _, per = _device_loop_rate(fn, args, 8)
        return per * 1e3

    emit_a = jax.jit(lambda pp, nn: emit_centered_table(pp, nn, cfg,
                                                        wblk=256))
    emit_b = jax.jit(lambda pp, nn: emit_centered_table(pp, nn, cfg,
                                                        wblk=512))
    ring_a = jax.jit(lambda f, i, mk: scatter_to_bev_ring(f, i, mk, cfg,
                                                          whalf=400))
    ring_b = jax.jit(lambda f, i, mk: scatter_to_bev_ring(f, i, mk, cfg,
                                                          whalf=800))
    # warm compiles
    for fn in (emit_a, emit_b):
        jax.tree.map(np.asarray, fn(d_pts, d_n))
    for fn in (ring_a, ring_b):
        np.asarray(fn(feats, pid, mask))

    reps = 5
    emit_pairs, ring_pairs = [], []
    for r in range(reps):
        ta = timed(emit_a, (d_pts, d_n))
        tb = timed(emit_b, (d_pts, d_n))
        emit_pairs.append((round(ta, 2), round(tb, 2)))
        ra = timed(ring_a, (feats, pid, mask))
        rb = timed(ring_b, (feats, pid, mask))
        ring_pairs.append((round(ra, 2), round(rb, 2)))
        sys.stderr.write(f"rep{r}: emit256={ta:.2f} emit512={tb:.2f} "
                         f"ring400={ra:.2f} ring800={rb:.2f}\n")

    def verdict(pairs):
        d = [b - a for a, b in pairs]
        return {"pairs": pairs, "median_delta_b_minus_a":
                round(float(np.median(d)), 2)}

    print(json.dumps({
        "emit_wblk_256_vs_512": verdict(emit_pairs),
        "ring_whalf_400_vs_800": verdict(ring_pairs),
    }))


if __name__ == "__main__":
    main()
