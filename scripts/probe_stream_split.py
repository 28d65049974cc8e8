#!/usr/bin/env python
"""Where do the stream kernel's ms go? Same-process differencing (b8 full
config): full stream vs dbg=nocum (no budget cumsum) vs dbg=stub (no
sidecar shifts at all) vs kernel-on-presorted-inputs (no sort/center),
against the fused-table control."""
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
    from tpu_pillars.ops.emit_pallas import sort_points_by_pillar
    from tpu_pillars.ops.fused_pfn import fold_decoration
    from tpu_pillars.ops.pfn_pallas import fold_bn
    from tpu_pillars.ops.stream_pfn import (
        points_to_canvas_stream, stream_canvas_from_sorted,
    )
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
    w_eff, w_dec = fold_decoration(w, b, cfg)

    # presorted, cell-centered inputs (device-resident)
    @jax.jit
    def sort_center(pts, n):
        gid_s, pts_s = sort_points_by_pillar(pts, n, cfg)
        col = (gid_s % cfg.grid_w).astype(jnp.float32)
        row = (gid_s // cfg.grid_w).astype(jnp.float32)
        cx = cfg.x_min + (col + 0.5) * cfg.voxel_x
        cy = cfg.y_min + (row + 0.5) * cfg.voxel_y
        return gid_s, jnp.concatenate([
            (pts_s[..., 0] - cx)[..., None],
            (pts_s[..., 1] - cy)[..., None],
            pts_s[..., 2:],
        ], axis=-1)

    d_gid, d_ptc = jax.tree.map(
        jax.device_put, jax.tree.map(np.asarray, sort_center(d_pts, d_n)))

    results = {}

    def run(tag, fn, args=None):
        args = (d_pts, d_n) if args is None else args
        t0 = time.time()
        _, per = _device_loop_rate(fn, args, 8)
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[{time.time()-t0:.0f}s]\n")
        return per * 1e3

    fused_fn = jax.jit(
        lambda pts, n: build_canvas_fn_batched(cfg)(det.variables, pts, n))

    def sfn(**kn):
        return jax.jit(lambda pts, n: points_to_canvas_stream(
            pts, n, w, b, cfg, lad_mode="fwd1", **kn))

    run("fused", fused_fn)
    run("stream", sfn())
    run("stream_nocum", sfn(dbg="nocum"))
    run("stream_stub", sfn(dbg="stub"))
    run("sort_center", sort_center)
    kern = jax.jit(lambda g, pc: stream_canvas_from_sorted(
        g, pc, w_eff, w_dec, cfg, lad_mode="fwd1"))
    run("kernel_presorted", kern, (d_gid, d_ptc))
    run("stream_again", sfn())
    run("fused_again", fused_fn)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
