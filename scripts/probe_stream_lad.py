#!/usr/bin/env python
"""Stream-kernel ladder variants, same-process A/B (b8 full config):
fwd (3 rolls/step) vs fwd1 (1 concat roll/step) vs off (timing floor,
WRONG values) — isolates the sublane-roll cost; plus whalf variants."""
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

    results = {}

    def run(tag, fn):
        t0 = time.time()
        try:
            _, per = _device_loop_rate(fn, (d_pts, d_n), 8)
        except Exception as e:  # noqa: BLE001
            results[tag] = f"failed: {type(e).__name__}"
            sys.stderr.write(f"{tag} FAILED: {str(e)[:300]}\n")
            return None
        results[tag] = round(per * 1e3, 2)
        sys.stderr.write(f"{tag}: {per*1e3:.2f} ms/iter "
                         f"[{time.time()-t0:.0f}s]\n")
        return per * 1e3

    def sfn(**kn):
        return jax.jit(lambda pts, n: points_to_canvas_stream(
            pts, n, w, b, cfg, **kn))

    fused_fn = jax.jit(
        lambda pts, n: build_canvas_fn_batched(cfg)(det.variables, pts, n))

    run("fused", fused_fn)
    run("fwd", sfn())
    run("fwd1", sfn(lad_mode="fwd1"))
    run("off", sfn(lad_mode="off"))
    run("fwd1_w200", sfn(lad_mode="fwd1", whalf=200))
    run("fwd1_wblk400", sfn(lad_mode="fwd1", wblk=400))
    run("fwd1_again", sfn(lad_mode="fwd1"))
    run("fused_again", fused_fn)

    # correctness of the winner on TPU
    ca = fused_fn(d_pts, d_n)
    cb = sfn(lad_mode="fwd1")(d_pts, d_n)
    mad = float(np.asarray(jax.jit(
        lambda a, b_: jnp.max(jnp.abs(a - b_)))(ca, cb)))
    results["fwd1_max_abs_diff"] = mad
    sys.stderr.write(f"fwd1 max|diff| vs fused = {mad:.3e}\n")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
