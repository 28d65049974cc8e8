#!/usr/bin/env python
"""Benchmark: jitted TPU points->boxes pipeline vs the CPU reference
(BASELINE.md: the CPU baseline must be MEASURED, not cited; north-star is
>=10x CPU sweeps/sec/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Runs on whatever jax.default_backend() is (the driver runs it on the real
TPU chip). The CPU baseline (NumPy pillarize + torch-CPU forward + NumPy
rotated NMS) is measured in-process on a few frames.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene
    from tpu_pillars.detector import Detector
    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.voxelize import PillarBatch
    from tpu_pillars.reference_cpu.convert import flax_to_torch
    from tpu_pillars.reference_cpu.pipeline import CPUReferenceDetector
    import jax.numpy as jnp

    cfg = PillarsConfig()  # full operating point: 400x400, 12k pillars, 9 cls
    rng = np.random.default_rng(0)

    # weights: init (BN identity) — throughput does not depend on values
    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    variables = model.init(jax.random.PRNGKey(0), dummy)

    # realistic sweep density: ~100k points in range
    scenes = [
        make_scene(rng, cfg, num_objects=40, points_per_object=300,
                   clutter=90000)
        for _ in range(4)
    ]
    sys.stderr.write(
        f"backend={jax.default_backend()} points/sweep="
        f"{[len(s.points) for s in scenes]}\n")

    det = Detector(cfg, variables)
    padded = [det.pad_points(s.points) for s in scenes]

    # --- TPU (or current-backend) e2e: padded points in, boxes out ---
    def run_once(i):
        out = det._forward(det.variables, jnp.asarray(padded[i][0]),
                           padded[i][1])
        jax.block_until_ready(out)
        return out

    run_once(0)  # compile
    t0 = time.perf_counter()
    iters = 20
    for i in range(iters):
        run_once(i % len(scenes))
    dt = time.perf_counter() - t0
    tpu_rate = iters / dt
    sys.stderr.write(f"jit pipeline: {tpu_rate:.2f} sweeps/s "
                     f"({1e3 * dt / iters:.1f} ms/sweep)\n")

    # --- CPU reference baseline ---
    cpu = CPUReferenceDetector(cfg, flax_to_torch(variables, cfg))
    cpu.predict_raw(scenes[0].points)  # warm caches
    t0 = time.perf_counter()
    cpu_iters = 3
    for i in range(cpu_iters):
        cpu.predict_raw(scenes[i % len(scenes)].points)
    cpu_dt = time.perf_counter() - t0
    cpu_rate = cpu_iters / cpu_dt
    sys.stderr.write(f"cpu reference: {cpu_rate:.3f} sweeps/s "
                     f"({cpu_dt / cpu_iters:.2f} s/sweep)\n")

    print(json.dumps({
        "metric": "lidar sweeps/sec/chip e2e (points->boxes)",
        "value": round(tpu_rate, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
