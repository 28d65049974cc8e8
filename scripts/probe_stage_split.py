#!/usr/bin/env python
"""Honest per-stage cost split of the batch-8 serving pipeline.

The recorded per-stage amortized numbers (front 21.9 + model 28.1 + post
7.1 = 57 ms) exceed the measured whole-loop batch time (34 ms) — each
stage loop carries per-iteration dispatch overhead the full pipeline
amortizes over more compute. This probe removes it by differencing NESTED
sub-pipelines (same dispatch count per iteration):

  null       : trivial jitted fn            -> per-iteration dispatch cost
  canvas     : points -> BEV canvas          (1 executable)
  model      : points -> wire tensors        (1 executable, = canvas+RPN)
  full       : points -> packed detections   (2 executables)

  honest RPN+head  = model - canvas
  honest postproc  = full - model - null     (the extra dispatch)
  honest frontend  = canvas - null
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
    from tpu_pillars.detector import Detector, build_canvas_fn_batched
    from tpu_pillars.models import PointPillars
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

    results = {}

    def run(tag, fn, args):
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, 8)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        return per * 1e3

    null_fn = jax.jit(lambda x: x + 1.0)
    t_null = run("null", null_fn, (jnp.zeros((8, 8), jnp.float32),))

    canvas_b = jax.jit(build_canvas_fn_batched(cfg))
    t_canvas = run("canvas", lambda p, n: canvas_b(det.variables, p, n),
                   (d_pts, d_n))

    t_model = run("model", lambda p, n: det._model_batch(det.variables, p, n),
                  (d_pts, d_n))

    t_full = run("full", lambda p, n: det._post_packed_batch(
        *det._model_batch(det.variables, p, n)), (d_pts, d_n))

    results["honest_frontend_ms"] = round(t_canvas - t_null, 2)
    results["honest_rpn_head_ms"] = round(t_model - t_canvas, 2)
    results["honest_postprocess_ms"] = round(t_full - t_model - t_null, 2)
    results["dispatch_ms"] = round(t_null, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
