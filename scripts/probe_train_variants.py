#!/usr/bin/env python
"""Train-step variants, same-process A/B/A (b4 + b8 full config, fused
front end): remat on (control) vs off, f32 vs bf16 — the remaining train
levers are fwd/bwd compute only (CLAUDE.md: optimizer 0.33 ms in-program,
donation an exact tie), so this ranks the two standing knobs under the
retuned kernels."""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene
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
        st = state
        st, losses = step_fn(st, batch)              # compile
        np.asarray(losses.total)
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
        run(f"b{bsz}_f32_remat_A", ctl, state, batch)
        if bsz == 4:   # b8 without remat fails to compile (CLAUDE.md)
            run(f"b{bsz}_f32_noremat",
                jax.jit(make_train_step(cfg, remat=False)), state, batch)
        run(f"b{bsz}_bf16_remat",
            jax.jit(make_train_step(cfg, remat=True,
                                    compute_dtype=jnp.bfloat16)),
            state, batch)
        run(f"b{bsz}_f32_remat_B", ctl, state, batch)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
