#!/usr/bin/env python
"""Batch-scaling probe for the device-resident inference loop.

Motivation: the 2026-08-18 bf16 A/B tied EXACTLY (235.1 vs 233.5 sweeps/s)
even though bf16 cuts conv compute ~9 ms/batch — so the chained-dispatch
loop is not compute-bound. The remaining suspect is per-iteration dispatch
cost through the axon tunnel (2 executable dispatches per batch). If that
binds, sweeps/s should scale near-linearly with batch size until compute
catches up. Order: b8 control, b16, b32, b8 again (drift control).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax

    from bench_extra import _device_loop_rate
    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene
    from tpu_pillars.detector import Detector
    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.voxelize import PillarBatch
    import jax.numpy as jnp

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
    base_pts = np.stack([p for p, _ in padded])
    base_n = np.asarray([c for _, c in padded])

    results = {}

    def loop_rate(batch, tag):
        reps = (batch + 7) // 8
        d_pts = jax.device_put(np.concatenate([base_pts] * reps)[:batch])
        d_n = jax.device_put(np.concatenate([base_n] * reps)[:batch])

        def infer_batch(pts, n):
            return det._post_packed_batch(*det._model_batch(det.variables, pts, n))

        t0 = time.time()
        rate, per = _device_loop_rate(infer_batch, (d_pts, d_n), batch,
                                      iters=max(12, 192 // batch))
        sys.stderr.write(f"{tag}: {rate:.1f} sweeps/s ({per*1e3/batch:.2f} "
                         f"ms/sweep, {per*1e3:.1f} ms/batch) "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        results[tag] = round(rate, 1)

    loop_rate(8, "b8_run1")
    loop_rate(16, "b16")
    loop_rate(32, "b32")
    loop_rate(8, "b8_run2")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
