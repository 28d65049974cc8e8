#!/usr/bin/env python
"""Secondary benchmarks (not the driver contract): bf16 inference serving
and full-size training-step throughput on the current backend. Prints
human-readable lines to stderr and a JSON summary to stdout.
"""

from __future__ import annotations

import json
import sys
import time
from collections import deque

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
    from tpu_pillars.detector import Detector
    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.voxelize import PillarBatch
    from tpu_pillars.train import TrainBatch, TrainConfig, create_train_state, make_train_step

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
    scenes = [make_scene(rng, cfg, num_objects=40, points_per_object=300,
                         clutter=90000) for _ in range(8)]
    results = {}

    # --- bf16 batch-8 serving ---
    det16 = Detector(cfg, variables, dtype=jnp.bfloat16)
    padded = [det16.pad_points(s.points) for s in scenes]
    pts_b = np.stack([p for p, _ in padded])
    n_b = np.asarray([c for _, c in padded])
    np.asarray(det16.predict_packed_batch(pts_b, n_b))
    t0 = time.perf_counter()
    reps = 6
    pending = deque()
    for _ in range(reps):
        pending.append(det16.predict_packed_batch(pts_b, n_b))
        if len(pending) > 2:
            np.asarray(pending.popleft())
    while pending:
        np.asarray(pending.popleft())
    rate = reps * 8 / (time.perf_counter() - t0)
    results["bf16_batch8_sweeps_per_s"] = round(rate, 2)
    sys.stderr.write(f"bf16 batch-8 serving: {rate:.2f} sweeps/s\n")

    # --- f16 wire-format batch-8 serving ---
    det_w16 = Detector(cfg, variables, wire_dtype=jnp.float16)
    padded16 = [det_w16.pad_points(s.points) for s in scenes]
    pts16 = np.stack([p for p, _ in padded16])
    n16 = np.asarray([c for _, c in padded16])
    np.asarray(det_w16.predict_packed_batch(pts16, n16))
    t0 = time.perf_counter()
    pending = deque()
    for _ in range(reps):
        pending.append(det_w16.predict_packed_batch(pts16, n16))
        if len(pending) > 2:
            np.asarray(pending.popleft())
    while pending:
        np.asarray(pending.popleft())
    rate = reps * 8 / (time.perf_counter() - t0)
    results["f16wire_batch8_sweeps_per_s"] = round(rate, 2)
    sys.stderr.write(f"f16-wire batch-8 serving: {rate:.2f} sweeps/s\n")

    # --- full-size train step throughput (batch 4) ---
    tcfg = TrainConfig(batch_size=4, max_gt_boxes=64, total_steps=100)
    state = create_train_state(cfg, tcfg)
    step = jax.jit(make_train_step(cfg))
    pts, npts, gb, gc, gv = scenes_to_train_batch(scenes[:4], cfg,
                                                  tcfg.max_gt_boxes)
    batch = TrainBatch(pts, npts, gb, gc, gv)
    state, losses = step(state, batch)
    _ = float(losses.total)  # sync through compile
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        state, losses = step(state, batch)
    _ = float(losses.total)  # host pull = true barrier
    step_s = (time.perf_counter() - t0) / iters
    results["train_step_s_batch4"] = round(step_s, 4)
    results["train_sweeps_per_s"] = round(4 / step_s, 2)
    sys.stderr.write(f"train step (batch 4, full size): {step_s*1e3:.0f} ms "
                     f"({4/step_s:.2f} sweeps/s)\n")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
