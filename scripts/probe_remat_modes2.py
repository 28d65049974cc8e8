#!/usr/bin/env python
"""Part 2 of the selective-remat A/B (see probe_remat_modes.py): the first
run measured b4_all_A 162.71 / b4_pfn 127.48 ms (same process, drifted env)
before its harness timeout. This run finishes the grid: b4_rpn, the b4_all
control repeat, and the batch-8 tier (the money question: does pfn-only
remat COMPILE AND FIT at b8 full size, where remat=off fails?)."""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.train.loop import synthetic_batches
    from tpu_pillars.train.state import TrainConfig, create_train_state
    from tpu_pillars.train.step import make_train_step

    cfg = PillarsConfig()
    results = {}

    def batch_for(bsz):
        tcfg = TrainConfig(batch_size=bsz)
        it = synthetic_batches(cfg, tcfg, seed=0, num_objects=40,
                               points_per_object=300, clutter=60000)
        return next(iter(it))

    def run(tag, step_fn, state, batch, iters=8):
        t0 = time.time()
        try:
            st, losses = step_fn(state, batch)          # compile
            np.asarray(losses.total)
        except Exception as e:                           # OOM / compile fail
            results[tag] = f"FAIL: {type(e).__name__}"
            sys.stderr.write(f"{tag}: FAILED ({e})\n"[:500])
            sys.stderr.flush()
            return
        t_compile = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            st, losses = step_fn(st, batch)
        np.asarray(losses.total)
        per = (time.perf_counter() - t0) / iters
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/step "
                         f"[compile {t_compile:.0f}s]\n")
        sys.stderr.flush()

    # batch 4: remaining variants + the A/B/A control repeat
    tcfg = TrainConfig(batch_size=4)
    state = create_train_state(cfg, tcfg)
    batch = batch_for(4)
    run("b4_rpn", jax.jit(make_train_step(cfg, remat="rpn")), state, batch)
    run("b4_pfn", jax.jit(make_train_step(cfg, remat="pfn")), state, batch)
    run("b4_all_B", jax.jit(make_train_step(cfg, remat=True)), state, batch)

    # batch 8: all (control) vs pfn-only
    tcfg = TrainConfig(batch_size=8)
    state = create_train_state(cfg, tcfg)
    batch = batch_for(8)
    ctl = jax.jit(make_train_step(cfg, remat=True))
    run("b8_all_A", ctl, state, batch)
    run("b8_pfn", jax.jit(make_train_step(cfg, remat="pfn")), state, batch)
    run("b8_all_B", ctl, state, batch)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
