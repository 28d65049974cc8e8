#!/usr/bin/env python
"""Secondary benchmarks (not the driver contract): bf16 inference serving,
full-size training-step throughput (+ per-stage breakdown), a DEVICE-
RESIDENT inference loop (inputs pre-staged, one pull at the end — chip-side
compute without the ~30-60 MB/s tunnel masking it), and the BASELINE
config #4 multi-sweep operating point. Prints human-readable lines to
stderr and a JSON summary to stdout.

Caveat (measured 2026-08-18): the train-step section runs LAST, after ~6
large compiles + device loops in this same process, and reads ~2x slower
than a fresh-process probe taken minutes apart (328 vs 153 ms b4 fused
f32). Treat this file's train rows as a smoke number; fresh-process
probes (scripts/probe_fused_train.py) are the authority for training.
"""

from __future__ import annotations

import json
import sys
import time
from collections import deque

import numpy as np


def _device_loop_rate(fn, args, batch, iters=24):
    """Amortized device time per call of `fn(*args)`.

    Methodology (each point matters on the axon tunnel):
      * a zero-valued scalar from each output is folded into the next
        input, so dispatches form a true dependency chain — no reordering
        and no dead-code elimination of unused outputs;
      * the sync is a ONE-element pull (np.asarray of a 1-float slice) —
        pulling a full output tensor would time the ~30-60 MB/s tunnel,
        not the chip (that mistake once produced stage times summing to 3x
        the measured whole pipeline);
      * two run lengths (iters and iters//3) are differenced to cancel the
        fixed dispatch/sync overhead.
    """
    import jax
    import jax.numpy as jnp

    a0 = args[0]

    def run(k):
        dep = jnp.zeros((1,), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(k):
            a = (a0 + dep.astype(a0.dtype) * 0,) + tuple(args[1:])
            out = fn(*a)
            dep = jax.tree.leaves(out)[0].ravel()[:1].astype(jnp.float32)
        np.asarray(dep)
        return time.perf_counter() - t0

    run(1)  # compile (fn and the chain ops) + sync
    small = max(1, iters // 3)
    t_small = run(small)
    t_big = run(iters)
    per = (t_big - t_small) / (iters - small)
    return batch / per, per


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
    from tpu_pillars.detector import Detector
    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.voxelize import PillarBatch
    from tpu_pillars.train import TrainBatch, TrainConfig, create_train_state, make_train_step

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

    # --- bf16 batch-8 serving ---
    det16 = Detector(cfg, variables, dtype=jnp.bfloat16)
    padded = [det16.pad_points(s.points) for s in scenes]
    pts_b = np.stack([p for p, _ in padded])
    n_b = np.asarray([c for _, c in padded])
    np.asarray(det16.predict_packed_batch(pts_b, n_b))
    t0 = time.perf_counter()
    reps = 6
    pending = deque()
    for _ in range(reps):
        pending.append(det16.predict_packed_batch(pts_b, n_b))
        if len(pending) > 2:
            np.asarray(pending.popleft())
    while pending:
        np.asarray(pending.popleft())
    rate = reps * 8 / (time.perf_counter() - t0)
    results["bf16_batch8_sweeps_per_s"] = round(rate, 2)
    sys.stderr.write(f"bf16 batch-8 serving: {rate:.2f} sweeps/s\n")

    # --- f16 wire-format batch-8 serving ---
    det_w16 = Detector(cfg, variables, wire_dtype=jnp.float16)
    padded16 = [det_w16.pad_points(s.points) for s in scenes]
    pts16 = np.stack([p for p, _ in padded16])
    n16 = np.asarray([c for _, c in padded16])
    np.asarray(det_w16.predict_packed_batch(pts16, n16))
    t0 = time.perf_counter()
    pending = deque()
    for _ in range(reps):
        pending.append(det_w16.predict_packed_batch(pts16, n16))
        if len(pending) > 2:
            np.asarray(pending.popleft())
    while pending:
        np.asarray(pending.popleft())
    rate = reps * 8 / (time.perf_counter() - t0)
    results["f16wire_batch8_sweeps_per_s"] = round(rate, 2)
    sys.stderr.write(f"f16-wire batch-8 serving: {rate:.2f} sweeps/s\n")

    # --- device-resident inference loop (VERDICT round 1, item 7):
    # batch-8 inputs pre-staged on device, one pull at the end — the
    # chip-side number the tunnel otherwise hides ---
    det = Detector(cfg, variables)
    padded32 = [det.pad_points(s.points) for s in scenes]
    d_pts = jax.device_put(np.stack([p for p, _ in padded32]))
    d_n = jax.device_put(np.asarray([c for _, c in padded32]))

    def infer_batch(pts, n):
        return det._post_packed_batch(*det._model_batch(det.variables, pts, n))

    rate, per = _device_loop_rate(infer_batch, (d_pts, d_n), 8)
    results["device_loop_batch8_sweeps_per_s"] = round(rate, 2)
    sys.stderr.write(f"device-resident batch-8 loop: {rate:.2f} sweeps/s "
                     f"({per*1e3/8:.2f} ms/sweep on-chip)\n")

    # per-stage amortized device times. CAVEAT (2026-08-18 honest-split
    # probes): each single-stage loop still carries (a) ~1.5-5 ms/iter of
    # host ENQUEUE cost — measure a null jit loop in-process to know it —
    # and (b) the cost of MATERIALIZING outputs the full pipeline only
    # consumes internally (returning anchor-major (A, k<=9) tensors once
    # inflated "convs" to 22 ms whose true in-graph cost was ~5). Rank
    # kernel work with scripts/probe_stage_split.py-style nested
    # differencing + an end-to-end A/B, not with these rows alone.
    from functools import partial

    from tpu_pillars.ops.emit_pallas import pillarize_batch_auto
    from tpu_pillars.ops.bev_pallas import scatter_to_bev_auto_pid
    from tpu_pillars.ops.fused_pfn import pillarize_pfn_fused
    from tpu_pillars.ops.pfn_pallas import fold_bn

    pill_b = jax.jit(partial(pillarize_batch_auto, config=cfg))
    _, per_pill = _device_loop_rate(lambda p, n: pill_b(p, n).features,
                                    (d_pts, d_n), 8)
    p_pfn = variables["params"]["pfn"]
    bs_pfn = variables["batch_stats"]["pfn"]["bn"]
    w_f, b_f = fold_bn(p_pfn["linear"]["kernel"], p_pfn["bn"]["scale"],
                       p_pfn["bn"]["bias"], bs_pfn["mean"], bs_pfn["var"])

    @jax.jit
    def fused_front(p, n):
        feats, pid, pm = pillarize_pfn_fused(p, n, w_f, b_f, cfg)
        return scatter_to_bev_auto_pid(feats, pid, pm, cfg)

    _, per_front = _device_loop_rate(fused_front, (d_pts, d_n), 8)
    o_b = det._model_batch(det.variables, d_pts, d_n)
    _, per_model = _device_loop_rate(
        lambda *o: det._model_batch(det.variables, d_pts, d_n)[0], o_b, 8)
    _, per_post = _device_loop_rate(
        lambda *o: det._post_packed_batch(*o), o_b, 8)
    results["stage_ms_batch8"] = {
        "classic_pillarize_decorate": round(per_pill * 1e3, 2),
        "fused_front_to_canvas": round(per_front * 1e3, 2),
        "model_stage": round(per_model * 1e3, 2),
        "postprocess": round(per_post * 1e3, 2),
    }
    sys.stderr.write(
        f"batch-8 stage times (amortized device): classic pillarize+"
        f"decorate {per_pill*1e3:.1f} ms, fused front->canvas "
        f"{per_front*1e3:.1f} ms, full model stage {per_model*1e3:.1f} ms, "
        f"decode+NMS {per_post*1e3:.1f} ms\n")

    # --- BASELINE config #4: multi-sweep accumulated clouds (VERDICT item 5)
    import warnings

    from tpu_pillars.config import multisweep_config

    cfg4 = multisweep_config()
    model4 = PointPillars(cfg4)
    dummy4 = PillarBatch(
        jnp.zeros((cfg4.max_pillars, cfg4.max_points_per_pillar,
                   cfg4.num_decorated_features)),
        jnp.zeros((cfg4.max_pillars, cfg4.max_points_per_pillar), bool),
        jnp.zeros((cfg4.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg4.max_pillars,), bool),
    )
    det4 = Detector(cfg4, model4.init(jax.random.PRNGKey(0), dummy4))
    # accumulate 10 synthetic sweeps: concat with per-sweep dt channel
    B4 = 4
    clouds4 = []
    for b in range(B4):
        sweeps = []
        for k in range(cfg4.num_sweeps):
            s = make_scene(rng, cfg4, num_objects=40, points_per_object=300,
                           clutter=90000)
            dt_col = np.full((len(s.points), 1), 0.1 * k, np.float32)
            sweeps.append(np.concatenate([s.points, dt_col], axis=1))
        clouds4.append(np.concatenate(sweeps, axis=0))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # counted below
        padded4 = [det4.pad_points(c) for c in clouds4]
    sys.stderr.write(
        f"config#4 clouds: {[len(c) for c in clouds4]} raw points, budget "
        f"{cfg4.max_points}, dropped {det4.truncation.dropped_points} total "
        f"({det4.truncation.truncated_clouds}/{B4} clouds truncated)\n")
    pts4 = np.stack([p for p, _ in padded4])
    n4 = np.asarray([c for _, c in padded4])
    np.asarray(det4.predict_packed_batch(pts4, n4))  # compile + sync
    t0 = time.perf_counter()
    pending = deque()
    for _ in range(reps):
        pending.append(det4.predict_packed_batch(pts4, n4))
        if len(pending) > 2:
            np.asarray(pending.popleft())
    while pending:
        np.asarray(pending.popleft())
    rate4 = reps * B4 / (time.perf_counter() - t0)
    results["multisweep10_batch4_sweeps_per_s"] = round(rate4, 2)
    sys.stderr.write(f"config#4 (10-sweep, 262k budget) batch-{B4} "
                     f"host-to-host: {rate4:.2f} accumulated-clouds/s\n")

    d_pts4, d_n4 = jax.device_put(pts4), jax.device_put(n4)

    def infer4(pts, n):
        return det4._post_packed_batch(
            *det4._model_batch(det4.variables, pts, n))

    rate4d, per4 = _device_loop_rate(infer4, (d_pts4, d_n4), B4, iters=12)
    results["multisweep10_device_loop_sweeps_per_s"] = round(rate4d, 2)
    sys.stderr.write(f"config#4 device-resident loop: {rate4d:.2f} clouds/s "
                     f"({per4*1e3/B4:.1f} ms/cloud on-chip)\n")

    # --- full-size train step throughput (batch 4) ---
    tcfg = TrainConfig(batch_size=4, max_gt_boxes=64, total_steps=100)
    state = create_train_state(cfg, tcfg)
    step = jax.jit(make_train_step(cfg))
    pts, npts, gb, gc, gv = scenes_to_train_batch(scenes[:4], cfg,
                                                  tcfg.max_gt_boxes)
    batch = TrainBatch(pts, npts, gb, gc, gv)
    state, losses = step(state, batch)
    _ = float(losses.total)  # sync through compile
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        state, losses = step(state, batch)
    _ = float(losses.total)  # host pull = true barrier
    step_s = (time.perf_counter() - t0) / iters
    results["train_step_s_batch4"] = round(step_s, 4)
    results["train_sweeps_per_s"] = round(4 / step_s, 2)
    sys.stderr.write(f"train step (batch 4, full size): {step_s*1e3:.0f} ms "
                     f"({4/step_s:.2f} sweeps/s)\n")

    # train-step stage breakdown (amortized device times): the front end
    # and target assignment are the two non-model costs fused into the
    # step. Both stages timed here are the ones the step actually uses on
    # TPU: the fused emit-table front end (train/step.py fused_frontend
    # auto; its PFN runs inside the grad program and lands in the
    # residual) and the windowed Pallas assigner (assigner="auto")
    from tpu_pillars.ops.assign_pallas import make_windowed_assigner
    from tpu_pillars.ops.fused_pfn import emit_centered_table

    d_tpts, d_tn = jax.device_put(pts), jax.device_put(npts)
    emit_b = jax.jit(lambda p, n: emit_centered_table(p, n, cfg))
    _, per_tpill = _device_loop_rate(
        lambda p, n: emit_b(p, n)[0], (d_tpts, d_tn), 4, iters=12)
    assign_b = jax.jit(make_windowed_assigner(cfg))
    d_gb, d_gc, d_gv = map(jax.device_put, (gb, gc, gv))
    _, per_assign = _device_loop_rate(
        lambda b, c, v: assign_b(b, c, v).reg_targets,
        (d_gb, d_gc, d_gv), 4, iters=12)
    grad_ms = (step_s - per_tpill - per_assign) * 1e3
    results["train_stage_ms_batch4"] = {
        "frontend_emit": round(per_tpill * 1e3, 1),
        "assign": round(per_assign * 1e3, 1),
        "grad_opt_residual": round(grad_ms, 1),
    }
    sys.stderr.write(
        f"train stages (batch 4): emit front end {per_tpill*1e3:.0f} ms, "
        f"assign {per_assign*1e3:.0f} ms, fused-PFN+fwd+bwd+opt residual "
        f"{grad_ms:.0f} ms\n")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
