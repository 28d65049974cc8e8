#!/usr/bin/env python
"""Same-process A/B: f32 vs bf16 device-resident batch-8 inference loop
under the CURRENT serving defaults (fused front end + block-gated Pallas
NMS via nms_impl='auto').

Context: the round-3 bf16 decision ("buys only ~1%") was measured when
postprocess cost 14.6 ms; the Pallas NMS default halved that, growing the
convs' share of the loop — re-measure before leaving f32 as the default.

Methodology: bench_extra._device_loop_rate (dependency-chained dispatches,
one-element pull sync, two run lengths differenced). Order f32, bf16, f32
again — the repeat is the environment-drift control.
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
    from tpu_pillars.detector import Detector
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
    scenes = [make_scene(rng, cfg, num_objects=40, points_per_object=300,
                         clutter=90000) for _ in range(8)]

    results = {}

    def loop_rate(det, tag):
        padded = [det.pad_points(s.points) for s in scenes]
        d_pts = jax.device_put(np.stack([p for p, _ in padded]))
        d_n = jax.device_put(np.asarray([c for _, c in padded]))

        def infer_batch(pts, n):
            return det._post_packed_batch(*det._model_batch(det.variables, pts, n))

        t0 = time.time()
        rate, per = _device_loop_rate(infer_batch, (d_pts, d_n), 8)
        sys.stderr.write(f"{tag}: {rate:.1f} sweeps/s ({per*1e3/8:.2f} ms/sweep)"
                         f" [compile+measure {time.time()-t0:.0f}s]\n")
        results[tag] = round(rate, 1)
        return rate

    det32 = Detector(cfg, variables)
    det16 = Detector(cfg, variables, dtype=jnp.bfloat16)
    loop_rate(det32, "f32_run1")
    loop_rate(det16, "bf16")
    loop_rate(det32, "f32_run2")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
