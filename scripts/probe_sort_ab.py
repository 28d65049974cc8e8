#!/usr/bin/env python
"""Emit-front-end sort A/B: decompose the per-sample stable sort cost
(round-3 VERDICT next-round #5 — the last XLA tier in the serving front
end, ~4.4 ms of the b8 batch per the r2 split).

Current production path (ops/emit_pallas.py sort_points_by_pillar): ONE
per-sample multi-operand `lax.sort` with `num_keys=1`, carrying the F
float payload columns through the comparator network. Decompose it:

  null                 dispatch floor
  sort_full            production: keys + F payload operands
  sort_kidx            keys + iota only (the irreducible comparator work a
                       Pallas sort must beat)
  sort_kidx_gather     keys + iota, then payload via take_along_axis
                       (the recorded r2 loser — re-baseline it)
  sort_unstable_kidx   is_stable=False on (key, iota) — measures what XLA
                       charges for stability (iota makes output unique but
                       NOT the canonical order, so this is a bound, not a
                       candidate)
  A-again              repeat of sort_full (drift control)

Decision rule: a Pallas bitonic/radix sort is only worth attempting if
sort_kidx (its best case: kernel sorts (key, idx), payload follows by
in-kernel or XLA gather) is well below sort_full AND the gather add-back
doesn't erase the gap. Measured numbers land in the docstring of
whatever ships (or parks) from this.
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
    from tpu_pillars.ops.emit_pallas import sort_points_by_pillar

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
    scenes = [make_scene(rng, cfg, num_objects=40, points_per_object=300,
                         clutter=90000) for _ in range(8)]
    padded = [det.pad_points(s.points) for s in scenes]
    d_pts = jax.device_put(np.stack([p for p, _ in padded]))
    d_n = jax.device_put(np.asarray([c for _, c in padded]))

    W, H = cfg.grid_w, cfg.grid_h
    HW = H * W

    def keys_of(pts, n):
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        M = pts.shape[1]
        pt_idx = jnp.arange(M, dtype=jnp.int32)
        alive = pt_idx[None, :] < n[:, None]
        col = jnp.floor((x - cfg.x_min) / cfg.voxel_x).astype(jnp.int32)
        row = jnp.floor((y - cfg.y_min) / cfg.voxel_y).astype(jnp.int32)
        in_range = ((col >= 0) & (col < W) & (row >= 0) & (row < H)
                    & (z >= cfg.z_min) & (z <= cfg.z_max))
        return jnp.where(alive & in_range, row * W + col, HW)

    def sort_kidx(pts, n):
        pid = keys_of(pts, n)
        iota = jnp.broadcast_to(
            jnp.arange(pts.shape[1], dtype=jnp.int32)[None], pid.shape)
        return jax.lax.sort([pid, iota], dimension=-1, is_stable=True,
                            num_keys=1)

    def sort_kidx_gather(pts, n):
        s, order = sort_kidx(pts, n)
        return s, jnp.take_along_axis(pts, order[..., None], axis=1)

    def sort_unstable_kidx(pts, n):
        pid = keys_of(pts, n)
        iota = jnp.broadcast_to(
            jnp.arange(pts.shape[1], dtype=jnp.int32)[None], pid.shape)
        return jax.lax.sort([pid, iota], dimension=-1, is_stable=False,
                            num_keys=1)

    def sort_unstable_2key(pts, n):
        # deterministic twin of the stable sort: iota as a SECOND KEY under
        # is_stable=False gives the exact stable order (unique composite
        # keys) — measures what XLA charges for is_stable=True vs an
        # explicit lexicographic comparator. Payload carried as in
        # production.
        pid = keys_of(pts, n)
        iota = jnp.broadcast_to(
            jnp.arange(pts.shape[1], dtype=jnp.int32)[None], pid.shape)
        ops = [pid, iota] + [pts[..., f] for f in range(pts.shape[-1])]
        out = jax.lax.sort(ops, dimension=-1, is_stable=False, num_keys=2)
        return out[0], jnp.stack(out[2:], axis=-1)

    results = {}

    def run(tag, fn, args=(None,)):
        if args == (None,):
            args = (d_pts, d_n)
        t0 = time.time()
        jfn = jax.jit(fn)
        # best-of-2 long loops: the env drifts enough same-day that a
        # single two-length differencing can go NEGATIVE (measured
        # 2026-08-20); min of two independent estimates is robust
        pers = [_device_loop_rate(jfn, args, 8, iters=64)[1]
                for _ in range(2)]
        per = min(p for p in pers if p > 0) if any(p > 0 for p in pers) \
            else max(pers)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"(runs {[round(p*1e3,2) for p in pers]}) "
                         f"[compile+measure {time.time()-t0:.0f}s]\n")
        return per * 1e3

    from tpu_pillars.ops.sort_pallas import sort_points_by_pillar_bitonic

    t_null = run("null", lambda x: x + 1.0,
                 (jnp.zeros((8, 8), jnp.float32),))
    t_full = run("sort_full", lambda p, n: sort_points_by_pillar(p, n, cfg))
    t_kidx = run("sort_kidx", sort_kidx)
    t_gather = run("sort_kidx_gather", sort_kidx_gather)
    t_unstable = run("sort_unstable_kidx", sort_unstable_kidx)
    t_2key = run("sort_unstable_2key", sort_unstable_2key)

    # 2-key variant must be bit-identical to production before any flip
    rk0, rp0 = jax.jit(
        lambda p, n: sort_points_by_pillar(p, n, cfg))(d_pts, d_n)
    k2, p2 = jax.jit(sort_unstable_2key)(d_pts, d_n)
    results["twokey_bit_equal"] = bool(
        (np.asarray(rk0) == np.asarray(k2)).all()
        and (np.asarray(rp0) == np.asarray(p2)).all())
    sys.stderr.write(f"2key bit-equal: {results['twokey_bit_equal']}\n")

    t_bit = t_bit_g = float("nan")
    try:
        # correctness spot-check on-chip before timing the kernel
        rk, rp = jax.jit(
            lambda p, n: sort_points_by_pillar(p, n, cfg))(d_pts, d_n)
        gk, gp = jax.jit(
            lambda p, n: sort_points_by_pillar_bitonic(p, n, cfg))(d_pts, d_n)
        keys_ok = bool((np.asarray(rk) == np.asarray(gk)).all())
        pay_ok = bool((np.asarray(rp) == np.asarray(gp)).all())
        results["bitonic_bit_equal"] = keys_ok and pay_ok
        sys.stderr.write(f"bitonic on-chip bit-equal: keys={keys_ok} "
                         f"payload={pay_ok}\n")

        t_bit = run("bitonic_carry",
                    lambda p, n: sort_points_by_pillar_bitonic(
                        p, n, cfg, carry_payload=True))
        t_bit_g = run("bitonic_gather",
                      lambda p, n: sort_points_by_pillar_bitonic(
                          p, n, cfg, carry_payload=False))
    except Exception as e:  # the kernel must not cost us the XLA numbers
        results["bitonic_error"] = str(e).split("\n")[0][:200]
        sys.stderr.write(f"bitonic section failed: {e}\n")
    t_again = run("sort_full_again",
                  lambda p, n: sort_points_by_pillar(p, n, cfg))

    results["honest_full_ms"] = round((t_full + t_again) / 2 - t_null, 2)
    results["honest_kidx_ms"] = round(t_kidx - t_null, 2)
    results["honest_gather_addback_ms"] = round(t_gather - t_kidx, 2)
    results["honest_stability_tax_ms"] = round(t_kidx - t_unstable, 2)
    results["honest_2key_ms"] = round(t_2key - t_null, 2)
    results["honest_bitonic_carry_ms"] = round(t_bit - t_null, 2)
    results["honest_bitonic_gather_ms"] = round(t_bit_g - t_null, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
