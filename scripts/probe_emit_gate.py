#!/usr/bin/env python
"""A/B the emit kernel's dead-chunk gate (gate_dead) at two occupancies:
the bench workload (~102k live of 131072 → ~22% dead chunks) and a sparse
one (~40k live → ~70% dead chunks). Chained-loop methodology; outputs
checked bit-equal before timing.
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
    from tpu_pillars.ops.fused_pfn import emit_centered_table
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
    det = Detector(cfg, variables)

    def batch_for(clutter):
        scenes = [make_scene(rng, cfg, num_objects=40, points_per_object=300,
                             clutter=clutter) for _ in range(8)]
        padded = [det.pad_points(s.points) for s in scenes]
        return (jax.device_put(np.stack([p for p, _ in padded])),
                jax.device_put(np.asarray([c for _, c in padded])))

    dense = batch_for(90000)
    sparse = batch_for(30000)

    results = {}

    def run(tag, fn, args):
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, 8)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        return per * 1e3

    run("null", jax.jit(lambda x: x + 1.0), (jnp.zeros((8, 8), jnp.float32),))

    gate_on = jax.jit(lambda p, n: emit_centered_table(p, n, cfg))
    gate_off = jax.jit(
        lambda p, n: emit_centered_table(p, n, cfg, gate_dead=False))

    for tag, (d_pts, d_n) in (("dense", dense), ("sparse", sparse)):
        t_on, m_on = map(np.asarray, gate_on(d_pts, d_n))
        t_off, m_off = map(np.asarray, gate_off(d_pts, d_n))
        assert (t_on == t_off).all() and (m_on == m_off).all(), tag
        run(f"emit_{tag}_gate_off", gate_off, (d_pts, d_n))
        run(f"emit_{tag}_gate_on", gate_on, (d_pts, d_n))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
