#!/usr/bin/env python
"""Isolate the IN-PROGRAM optimizer cost of the train step: the same jitted
train_step with the real tx (clip_by_global_norm + adamw + schedule) vs
tx = optax.set_to_zero() (moments/clip/schedule math removed, everything
else identical). The difference is the true optimizer cost with no
dispatch confound. A/B/A ordering controls drift.

MEASURED (v5e, 2026-08-19, A/B/A stable to 0.03 ms): step_real_tx
103.06/103.05 ms, step_scale_tx 102.73/102.70, step_zero_tx 39.91.
In-program optimizer cost = 0.33 ms (real - scale). Forward-only (backward
DCE'd under set_to_zero) = 39.9 ms; backward = 62.8 ms (~1.6x fwd — remat
recomputes the forward inside the backward). The train step has NO
optimizer/donation fat; all remaining levers are in fwd/bwd compute.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import optax

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
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
    batch = jax.device_put(TrainBatch(pts, npts, gb, gc, gv))
    state = jax.device_put(create_train_state(cfg, tcfg))
    zero_tx = optax.set_to_zero()
    state_zero = state.replace(tx=zero_tx,
                               opt_state=zero_tx.init(state.params))
    # scale(tiny): keeps the backward alive (updates consume grads) but has
    # no moments/clip/schedule — the real-vs-scale delta is the true
    # in-program cost of clip_by_global_norm + adamw
    scale_tx = optax.scale(1e-30)
    state_scale = state.replace(tx=scale_tx,
                                opt_state=scale_tx.init(state.params))

    step = jax.jit(make_train_step(cfg))
    results = {}

    def timeit(tag, s0, iters=10):
        s, losses = step(s0, batch)
        _ = float(losses.total)
        t0 = time.perf_counter()
        s = s0
        for _ in range(iters):
            s, losses = step(s, batch)
        _ = float(losses.total)
        per = (time.perf_counter() - t0) / iters * 1e3
        results[tag] = round(per, 2)
        sys.stderr.write(f"{tag}: {per:.2f} ms\n")
        return per

    timeit("step_real_tx", state)
    timeit("step_scale_tx", state_scale)
    timeit("step_zero_tx", state_zero)   # fwd-only (XLA DCEs the backward)
    timeit("step_real_tx_2", state)
    timeit("step_scale_tx_2", state_scale)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
