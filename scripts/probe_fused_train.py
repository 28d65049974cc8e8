"""A/B the fused train front end (pfn_train_from_table) vs the classic
pillarize+decorate+PFN forward, full-size config on the real TPU.

Run: timeout 3600 python scripts/probe_fused_train.py > /tmp/probe_ft.log 2>&1
(one process, sequential compiles; the FIRST large compile can take 10-17 min
through the axon compile service — see CLAUDE.md.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import PillarsConfig
from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
from tpu_pillars.train import (
    TrainBatch, TrainConfig, create_train_state, make_train_step,
)


def log(msg):
    sys.stderr.write(msg + "\n")
    sys.stderr.flush()


def time_step(step, state, batch, iters=8):
    state, losses = step(state, batch)
    _ = float(losses.total)  # sync through compile
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch)
    tot = float(losses.total)  # host pull = true barrier
    return (time.perf_counter() - t0) / iters, tot


def main():
    cfg = PillarsConfig()
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    scenes = [make_scene(rng, cfg, num_objects=24, points_per_object=120,
                         clutter=60000) for _ in range(8)]

    # classic b8 f32/bf16 are already on record (172 / 145 ms, CLAUDE.md);
    # keep classic b4 as the same-day control and measure fused at all
    # three operating points. 4 large compiles in one process.
    runs = (
        (4, jnp.float32, True), (4, jnp.float32, False),
        (8, jnp.float32, True), (8, jnp.bfloat16, True),
    )
    for B, dtype, fused in runs:
        tcfg = TrainConfig(batch_size=B, max_gt_boxes=64, total_steps=100)
        pts, npts, gb, gc, gv = scenes_to_train_batch(scenes[:B], cfg,
                                                      tcfg.max_gt_boxes)
        batch = TrainBatch(pts, npts, gb, gc, gv)
        state = create_train_state(cfg, tcfg)
        step = jax.jit(make_train_step(cfg, compute_dtype=dtype,
                                       fused_frontend=fused))
        t0 = time.perf_counter()
        per, tot = time_step(step, state, batch)
        log(f"b{B} {jnp.dtype(dtype).name} fused={fused}: {per*1e3:.1f} "
            f"ms/step ({B/per:.1f} sweeps/s)  total_loss={tot:.4f}  "
            f"[compile+bench {time.perf_counter()-t0:.0f} s]")


if __name__ == "__main__":
    main()
