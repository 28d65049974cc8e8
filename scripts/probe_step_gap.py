#!/usr/bin/env python
"""Find the ~30 ms between value_and_grad (93-97 ms b4) and the full train
step (123 ms) — a gap that reproduces across days and is ~24% of the step.
Candidates: the optax update (clip_by_global_norm + adamw + schedule), the
state rebuild / missing donation (buffer copies), or the measurement
methodology. All timed in ONE process with the same state-threaded loop.

MEASURED (v5e, 2026-08-19): full_step 103.04 ms, opt_only 3.55 ms,
full_step_donated 102.92, full_step_again 102.85. Donation is an EXACT TIE
(XLA already reuses the buffers); the standalone optimizer is 3.5 ms of
which ~3 ms is dispatch (see probe_step_gap2: in-program cost 0.33 ms).
The "30 ms gap" was cross-process drift — the 96.8 ms grad and 123 ms step
numbers came from different processes/days; today's same-process step is
103 ms. VERDICT: no optimizer/donation lever exists; the step is fwd 39.9 +
bwd ~62.8 + optimizer 0.3 (probe_step_gap2).
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
    import optax

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
    from tpu_pillars.train import (
        TrainBatch, TrainConfig, create_train_state, make_train_step,
    )
    from tpu_pillars.train.step import make_train_step as _mts  # noqa: F401

    cfg = PillarsConfig()
    B = 4
    rng = np.random.default_rng(0)
    scenes = [make_scene(rng, cfg, num_objects=24, points_per_object=120,
                         clutter=60000) for _ in range(B)]
    tcfg = TrainConfig(batch_size=B, max_gt_boxes=64, total_steps=100)
    pts, npts, gb, gc, gv = scenes_to_train_batch(scenes, cfg,
                                                  tcfg.max_gt_boxes)
    batch = jax.device_put(TrainBatch(pts, npts, gb, gc, gv))
    state = create_train_state(cfg, tcfg)
    state = jax.device_put(state)

    results = {}

    def timeit(tag, fn, s0, iters=10):
        # chain from the warmup's OUTPUT state: with donate_argnums the
        # warmup invalidates s0's buffers, so s0 must never be reused
        s, aux = fn(s0, batch)
        jax.tree.map(lambda x: x.block_until_ready(), (s, aux))
        _ = float(jax.tree.leaves(aux)[0])          # honest pull
        t0 = time.perf_counter()
        for _ in range(iters):
            s, aux = fn(s, batch)
        _ = float(jax.tree.leaves(aux)[0])
        per = (time.perf_counter() - t0) / iters * 1e3
        results[tag] = round(per, 2)
        sys.stderr.write(f"{tag}: {per:.2f} ms\n")
        return per

    step = jax.jit(make_train_step(cfg))
    timeit("full_step", step, state)

    # optimizer alone on synthetic grads shaped like params
    from tpu_pillars.train.state import make_optimizer
    tx = make_optimizer(tcfg)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, state.params)
    grads = jax.device_put(grads)

    @jax.jit
    def opt_only(s, g):
        updates, new_opt = tx.update(g, s.opt_state, s.params)
        new_params = optax.apply_updates(s.params, updates)
        return s.replace(step=s.step + 1, params=new_params,
                         opt_state=new_opt), jax.tree.leaves(updates)[0].ravel()[0]

    sj, aux = opt_only(state, grads)
    _ = float(aux)
    t0 = time.perf_counter()
    s = state
    for _ in range(50):
        s, aux = opt_only(s, grads)
    _ = float(aux)
    results["opt_only"] = round((time.perf_counter() - t0) / 50 * 1e3, 2)
    sys.stderr.write(f"opt_only: {results['opt_only']:.2f} ms\n")

    # full step with donation (params/opt_state buffers reused in place);
    # donate a private COPY so the drift-control rerun below keeps a live state
    state_don = jax.tree.map(jnp.copy, state)
    step_don = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    timeit("full_step_donated", step_don, state_don)

    # full step again (drift control)
    timeit("full_step_again", step, state)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
