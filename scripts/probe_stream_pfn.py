#!/usr/bin/env python
"""Same-process A/B/A: fused-table front end (emit + PFN + ring scatter)
vs the streaming table-free kernel (ops/stream_pfn.py), batch-8 full
config, points -> canvas. On-device max-abs-diff checks correctness
without pulling canvases through the tunnel."""
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
    from tpu_pillars.ops.pfn_pallas import fold_bn
    from tpu_pillars.ops.stream_pfn import points_to_canvas_stream
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
    scenes = [make_scene(rng, cfg, num_objects=40, points_per_object=300,
                         clutter=90000) for _ in range(8)]
    padded = [det.pad_points(s.points) for s in scenes]
    d_pts = jax.device_put(np.stack([p for p, _ in padded]))
    d_n = jax.device_put(np.asarray([c for _, c in padded]))

    p = variables["params"]["pfn"]
    bs = variables["batch_stats"]["pfn"]["bn"]
    w, b = fold_bn(p["linear"]["kernel"], p["bn"]["scale"],
                   p["bn"]["bias"], bs["mean"], bs["var"])

    fused_fn = jax.jit(
        lambda pts, n: build_canvas_fn_batched(cfg)(det.variables, pts, n))
    stream_fn = jax.jit(
        lambda pts, n: points_to_canvas_stream(pts, n, w, b, cfg))

    # --- correctness first (on-device compare, scalar pull) ---
    t0 = time.time()
    ca = fused_fn(d_pts, d_n)
    cb = stream_fn(d_pts, d_n)
    diff = jax.jit(lambda a, b_: (
        jnp.max(jnp.abs(a - b_)),
        jnp.sum(jnp.any(a != 0.0, -1) != jnp.any(b_ != 0.0, -1))))
    mad, occ_mismatch = diff(ca, cb)
    scale = float(np.asarray(jnp.max(jnp.abs(ca))))
    sys.stderr.write(
        f"max|fused-stream|={float(np.asarray(mad)):.3e} "
        f"(canvas max {scale:.3f}), occupancy mismatches="
        f"{int(np.asarray(occ_mismatch))} [compile+check {time.time()-t0:.0f}s]\n")

    results = {"max_abs_diff": float(np.asarray(mad)),
               "occ_mismatch_cells": int(np.asarray(occ_mismatch))}

    def run(tag, fn):
        t0 = time.time()
        _, per = _device_loop_rate(fn, (d_pts, d_n), 8)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[{time.time()-t0:.0f}s]\n")
        return per * 1e3

    run("null", jax.jit(lambda x, n: x.ravel()[:1] + 1.0))
    run("fused_a", fused_fn)
    run("stream", stream_fn)
    run("fused_b", fused_fn)
    # knob variants (cheap once the first stream compile is paid)
    for tag, knobs in (("stream_w800", dict(whalf=800)),
                       ("stream_ck2048", dict(ck=2048)),
                       ("stream_nogate", dict(gate_blocks=False))):
        try:
            fn = jax.jit(lambda pts, n, kn=knobs: points_to_canvas_stream(
                pts, n, w, b, cfg, **kn))
            run(tag, fn)
        except Exception as e:  # noqa: BLE001
            results[tag] = f"failed: {type(e).__name__}"
            sys.stderr.write(f"{tag} failed: {e}\n"[:500])
    run("stream_again", stream_fn)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
