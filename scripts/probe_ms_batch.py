#!/usr/bin/env python
"""Post-retune re-measurements: (a) config #4 (10-sweep multisweep) on-chip
device-loop rate — the emit dead-chunk gate should pay most here (262k-point
budget, real clouds rarely fill it); (b) batch scaling of the default config
under the new kernel defaults (b8 was the measured optimum pre-retune).
Chained-loop methodology with a null control; same process.
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
    from tpu_pillars.config import PillarsConfig, multisweep_config
    from tpu_pillars.data.synthetic import make_scene
    from tpu_pillars.detector import Detector
    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.voxelize import PillarBatch

    results = {}

    def run(tag, fn, args, iters=8):
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, iters)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        return per * 1e3

    def detector_for(cfg):
        model = PointPillars(cfg)
        dummy = PillarBatch(
            jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                       cfg.num_decorated_features)),
            jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
            jnp.zeros((cfg.max_pillars, 2), jnp.int32),
            jnp.zeros((cfg.max_pillars,), bool),
        )
        variables = model.init(jax.random.PRNGKey(0), dummy)
        return Detector(cfg, variables)

    def batch_for(det, cfg, b, clutter, extra_feats=0):
        rng = np.random.default_rng(0)
        scenes = [make_scene(rng, cfg, num_objects=40,
                             points_per_object=300, clutter=clutter)
                  for _ in range(b)]
        padded = [det.pad_points(s.points) for s in scenes]
        return (jax.device_put(np.stack([p for p, _ in padded])),
                jax.device_put(np.asarray([c for _, c in padded])))

    run("null", jax.jit(lambda x: x + 1.0),
        (jnp.zeros((8, 8), jnp.float32),))

    # ---- batch scaling, default config ------------------------------
    cfg = PillarsConfig()
    det = detector_for(cfg)
    for b in (8, 16, 8):
        pts, ns = batch_for(det, cfg, b, 90000)
        fn = jax.jit(lambda p, n: det._post_packed_batch(
            *det._model_batch(det.variables, p, n)))
        per = run(f"full_b{b}", fn, (pts, ns))
        results[f"sweeps_per_s_b{b}"] = round(b / (per / 1e3), 1)

    # ---- config #4 multisweep on-chip loop --------------------------
    ms = multisweep_config()
    det4 = detector_for(ms)
    # ~120k live points of the 262k budget — the realistic occupancy the
    # gate targets (synthetic multisweep scenes via extra clutter)
    pts4, ns4 = batch_for(det4, ms, 4, 110000)
    fn4 = jax.jit(lambda p, n: det4._post_packed_batch(
        *det4._model_batch(det4.variables, p, n)))
    per4 = run("ms_b4", fn4, (pts4, ns4))
    results["clouds_per_s_ms_b4"] = round(4 / (per4 / 1e3), 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
