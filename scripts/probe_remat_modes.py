#!/usr/bin/env python
"""Selective-remat A/B/A (full config, fused front end): the standing train
levers are fwd/bwd compute only, and under remat="all" the backward is
~1.6x the forward because every block recomputes. "pfn" keeps the RPN conv
activations saved (recompute-free conv backward) while still checkpointing
the dominant (rows, N, C) PFN tensor — this probe asks whether the saved
recompute beats the extra HBM traffic/pressure, same-process paired.

RESULT (2026-08-20, run 1 killed by harness timeout mid-grid; run 2 =
probe_remat_modes2.py completed): NO. With a clean control (b4_all
124.07, matching the 123 ms record) pfn-only LOSES at b4 (132.28) and
badly at b8 (307.30 vs 264.25/218.48 all-remat bracket); rpn-only ties
(122.36). Run 1's apparent pfn win (127.48 vs 162.71) was a drifted
control. remat="all" stays the default; modes kept as tested knobs."""
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

    for bsz in (4, 8):
        tcfg = TrainConfig(batch_size=bsz)
        state = create_train_state(cfg, tcfg)
        batch = batch_for(bsz)
        ctl = jax.jit(make_train_step(cfg, remat=True))
        run(f"b{bsz}_all_A", ctl, state, batch)
        run(f"b{bsz}_pfn",
            jax.jit(make_train_step(cfg, remat="pfn")), state, batch)
        if bsz == 4:
            run(f"b{bsz}_rpn",
                jax.jit(make_train_step(cfg, remat="rpn")), state, batch)
        run(f"b{bsz}_all_B", ctl, state, batch)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
