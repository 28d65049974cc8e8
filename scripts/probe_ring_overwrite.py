#!/usr/bin/env python
"""A/B the half-overwrite ring scatter (steady-state rounds drain a half
and OVERWRITE it with a half-window one-hot matmul instead of a full-window
read-add) against its pre-change record (7.75 ms b8 r128/w400, 2026-08-19)
and re-sweep (rchunk, whalf) — the overwrite changes the cost structure
(initial full-window add ~ 2*whalf; steady rounds ~ whalf), so the basin
may move. The XLA scatter rides along as the environment-drift control
(record: 14.6 ms b8). Every variant is checked bit-equal to the XLA
scatter before it is timed.
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
    from tpu_pillars.ops.bev_pallas import scatter_to_bev_ring
    from tpu_pillars.ops.fused_pfn import pillarize_pfn_fused
    from tpu_pillars.ops.pfn_pallas import fold_bn
    from tpu_pillars.ops.voxelize import PillarBatch, scatter_to_bev

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

    results = {}

    def run(tag, fn, args):
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, 8)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        return per * 1e3

    run("null", jax.jit(lambda x: x + 1.0), (jnp.zeros((8, 8), jnp.float32),))

    feats_fn = jax.jit(lambda pts, n: pillarize_pfn_fused(pts, n, w, b, cfg))
    feats, pid, mask = feats_fn(d_pts, d_n)
    feats, pid, mask = map(jax.device_put, map(np.asarray,
                                               (feats, pid, mask)))

    # drift control + fidelity oracle
    coords = jnp.stack([pid // cfg.grid_w, pid % cfg.grid_w], -1) \
        * mask[..., None]
    xla_fn = jax.jit(lambda f, c2, mk: scatter_to_bev(f, c2, mk, cfg))
    c_ref = np.asarray(xla_fn(feats, coords, mask))
    run("xla_scatter_control", xla_fn, (feats, coords, mask))

    def ring_with(**kn):
        return jax.jit(lambda f, i, mk: scatter_to_bev_ring(f, i, mk, cfg,
                                                            **kn))

    variants = [
        dict(whalf=400, steady_overwrite=False),   # old formulation
        dict(whalf=400, steady_overwrite=True),
        dict(whalf=200, steady_overwrite=True),
        dict(whalf=200, steady_overwrite=False),
        dict(whalf=400, steady_overwrite=False),   # drift control repeat
        dict(whalf=400, steady_overwrite=True),    # drift control repeat
    ]
    for i, kn in enumerate(variants):
        tag = "ring{}_w{}_{}".format(i, kn["whalf"],
                                     "ow" if kn["steady_overwrite"] else "ra")
        fn = ring_with(**kn)
        try:
            cv = np.asarray(fn(feats, pid, mask))
            if not (cv == c_ref).all():
                results[tag] = "MISMATCH"
                sys.stderr.write(f"{tag}: OUTPUT MISMATCH vs XLA scatter\n")
                continue
            run(tag, fn, (feats, pid, mask))
        except Exception as e:  # noqa: BLE001
            results[tag] = f"FAIL {type(e).__name__}"
            sys.stderr.write(f"{tag}: {type(e).__name__}: {e}\n"[:500])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
