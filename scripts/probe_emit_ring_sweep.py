#!/usr/bin/env python
"""Knob sweep for the two biggest serving kernels (2026-08-19 honest split,
b8: emit 10.5 ms, ring scatter 7.5 ms of the 33.3 ms two-exec batch).

Hypothesis under test: per-grid-step / per-add-round FIXED overhead
dominates both kernels (their MAC-count models predict ~2 ms each), so
bigger chunks (fewer grid steps) should win. Each variant is timed with the
chained-loop methodology (bench_extra._device_loop_rate) and checked
bit-equal against the default-knob output before its number is trusted.

emit knobs:   k (points/grid step), whalf (flush half-window), wblk
ring knobs:   rchunk (pillars/grid step), whalf
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
    from tpu_pillars.ops.fused_pfn import (
        emit_centered_table, pillarize_pfn_fused,
    )
    from tpu_pillars.ops.pfn_pallas import fold_bn
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

    results = {}

    def run(tag, fn, args):
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, 8)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        return per * 1e3

    run("null", jax.jit(lambda x: x + 1.0), (jnp.zeros((8, 8), jnp.float32),))

    # ---- emit sweep --------------------------------------------------
    P = cfg.max_pillars

    def emit_with(**kn):
        return jax.jit(lambda pts, n: emit_centered_table(pts, n, cfg, **kn))

    base_fn = emit_with()
    t_ref, m_ref = base_fn(d_pts, d_n)
    t_ref = np.asarray(t_ref).reshape(8, -1, t_ref.shape[-1])[:, :P]
    m_ref = np.asarray(m_ref).reshape(8, 8, -1)[:, :, :P]
    run("emit_k1024_w1024_b256", base_fn, (d_pts, d_n))

    emit_variants = [
        dict(k=2048, whalf=2048),
        dict(k=4096, whalf=4096),
        dict(wblk=512),
        dict(wblk=128),
        dict(whalf=2048),
        dict(k=2048, whalf=2048, wblk=512),
    ]
    for kn in emit_variants:
        tag = "emit_k{}_w{}_b{}".format(kn.get("k", 1024),
                                        kn.get("whalf", 1024),
                                        kn.get("wblk", 256))
        fn = emit_with(**kn)
        try:
            tv, mv = fn(d_pts, d_n)
            tv = np.asarray(tv).reshape(8, -1, tv.shape[-1])[:, :P]
            mv = np.asarray(mv).reshape(8, 8, -1)[:, :, :P]
            ok = (tv == t_ref).all() and (mv == m_ref).all()
            if not ok:
                results[tag] = "MISMATCH"
                sys.stderr.write(f"{tag}: OUTPUT MISMATCH\n")
                continue
            run(tag, fn, (d_pts, d_n))
        except Exception as e:  # noqa: BLE001
            results[tag] = f"FAIL {type(e).__name__}"
            sys.stderr.write(f"{tag}: {type(e).__name__}: {e}\n"[:500])

    # ---- ring scatter sweep ------------------------------------------
    feats_fn = jax.jit(lambda pts, n: pillarize_pfn_fused(pts, n, w, b, cfg))
    feats, pid, mask = feats_fn(d_pts, d_n)
    feats, pid, mask = map(jax.device_put, map(np.asarray,
                                               (feats, pid, mask)))

    def ring_with(**kn):
        return jax.jit(lambda f, i, mk: scatter_to_bev_ring(f, i, mk, cfg,
                                                            **kn))

    base_ring = ring_with()
    c_ref = np.asarray(base_ring(feats, pid, mask))
    run("ring_r256_wauto", base_ring, (feats, pid, mask))

    ring_variants = [
        dict(rchunk=128, whalf=640),
        dict(rchunk=128, whalf=800),
        dict(rchunk=128, whalf=400),
        dict(rchunk=64, whalf=320),
        dict(rchunk=256, whalf=1600),
    ]
    for kn in ring_variants:
        tag = "ring_r{}_w{}".format(kn.get("rchunk", 256), kn.get("whalf"))
        fn = ring_with(**kn)
        try:
            cv = np.asarray(fn(feats, pid, mask))
            if not (cv == c_ref).all():
                results[tag] = "MISMATCH"
                sys.stderr.write(f"{tag}: OUTPUT MISMATCH\n")
                continue
            run(tag, fn, (feats, pid, mask))
        except Exception as e:  # noqa: BLE001
            results[tag] = f"FAIL {type(e).__name__}"
            sys.stderr.write(f"{tag}: {type(e).__name__}: {e}\n"[:500])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
