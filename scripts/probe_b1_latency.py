#!/usr/bin/env python
"""Single-sweep (batch-1) on-chip latency — the BASELINE 'p50 voxelize+NMS
latency' metric at the latency-optimal operating point (batch 8 maximizes
throughput; an AV serving stack cares about one-sweep latency too).

Reports the device-resident chained-loop time for the full points->packed
pipeline at batch 1, the p50/p90 of individual dispatch+pull round trips
(closer to what a caller observes), and the b1 voxelize-only and
postprocess-only chained times.
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
    from tpu_pillars.detector import Detector, build_canvas_fn_batched
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
    det = Detector(cfg, variables)
    scene = make_scene(rng, cfg, num_objects=40, points_per_object=300,
                       clutter=90000)
    p, n = det.pad_points(scene.points)
    d_pts = jax.device_put(p[None])
    d_n = jax.device_put(np.asarray([n]))

    results = {}

    def run(tag, fn, args):
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, 8)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        return per * 1e3

    run("null", jax.jit(lambda x: x + 1.0), (jnp.zeros((8, 8), jnp.float32),))

    canvas_b = jax.jit(build_canvas_fn_batched(cfg))
    run("b1_canvas", lambda pp, nn: canvas_b(det.variables, pp, nn),
        (d_pts, d_n))
    full = jax.jit(lambda pp, nn: det._post_packed_batch(
        *det._model_batch(det.variables, pp, nn)))
    run("b1_full_chained", full, (d_pts, d_n))

    # individual round trips: dispatch -> device -> host pull, the latency a
    # synchronous caller observes with inputs already device-resident
    out = full(d_pts, d_n)
    jax.tree.map(np.asarray, out)
    lats = []
    for _ in range(50):
        t0 = time.perf_counter()
        out = full(d_pts, d_n)
        jax.tree.map(np.asarray, out)     # host pull = only honest barrier
        lats.append((time.perf_counter() - t0) * 1e3)
    lats = np.array(lats)
    results["b1_roundtrip_p50_ms"] = round(float(np.percentile(lats, 50)), 2)
    results["b1_roundtrip_p90_ms"] = round(float(np.percentile(lats, 90)), 2)
    sys.stderr.write(f"roundtrip p50={results['b1_roundtrip_p50_ms']} "
                     f"p90={results['b1_roundtrip_p90_ms']}\n")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
