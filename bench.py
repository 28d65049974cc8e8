#!/usr/bin/env python
"""Benchmark: jitted TPU points->boxes pipeline vs the CPU reference
(BASELINE.md: the CPU baseline must be MEASURED, not cited; north-star is
>=10x CPU sweeps/sec/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Runs on whatever jax.default_backend() is (the driver runs it on the real
TPU chip). The CPU baseline (NumPy pillarize + torch-CPU forward + NumPy
rotated NMS) is measured in-process on a few frames.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene
    from tpu_pillars.detector import Detector
    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.voxelize import PillarBatch
    from tpu_pillars.reference_cpu.convert import flax_to_torch
    from tpu_pillars.reference_cpu.pipeline import CPUReferenceDetector
    import jax.numpy as jnp

    cfg = PillarsConfig()  # full operating point: 400x400, 12k pillars, 9 cls
    rng = np.random.default_rng(0)

    # weights: init (BN identity) — throughput does not depend on values
    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    variables = model.init(jax.random.PRNGKey(0), dummy)

    # realistic sweep density: ~100k points in range; distinct scenes so no
    # proxy-level caching can flatter the numbers
    scenes = [
        make_scene(rng, cfg, num_objects=40, points_per_object=300,
                   clutter=90000)
        for _ in range(8)
    ]
    sys.stderr.write(
        f"backend={jax.default_backend()} points/sweep="
        f"{[len(s.points) for s in scenes[:3]]}...\n")

    # bucketed upload shapes (16384-spaced static grid): each sweep pads to
    # the smallest fitting bucket instead of the full 131072-row buffer —
    # bit-equal boxes by test (test_detector_e2e.py), ~12.5% fewer wire
    # bytes at this scene density. Measured +2-5% on the transfer-bound
    # host-to-host loops (probe_wire_buckets.py A/B/A: batch-8 26.6 vs
    # 26.1/24.5 full-buffer; stream 26.9 vs 26.4) — the dispatch pipeline
    # already overlaps most of the upload.
    det = Detector(cfg, variables,
                   wire_buckets=tuple(range(16384, cfg.max_points + 1,
                                            16384)))
    padded = [det.pad_points(s.points) for s in scenes]

    # --- e2e serving loop: host points in -> host boxes out, every frame.
    # Packed detections = ONE d2h transfer per sweep; a small software
    # pipeline (depth 3) overlaps frame i's result pull with frame i+k's
    # upload/compute — real serving does the same. The result pull is the
    # only honest sync on this backend (block_until_ready returns early
    # through the axon proxy).
    from collections import deque

    def serve(iters, depth=3):
        pending = deque()
        results = []
        t0 = time.perf_counter()
        for i in range(iters):
            out = det.predict_packed(scenes[i % len(scenes)].points)
            pending.append(out)
            if len(pending) > depth:
                results.append(np.asarray(pending.popleft()))
        while pending:
            results.append(np.asarray(pending.popleft()))
        return time.perf_counter() - t0, results

    # best-of-2 timed runs throughout (mirroring the CPU baseline's
    # best-of-3): this environment drifts +/-15% same-day (CLAUDE.md),
    # and a best-of is robust to transient tunnel/host load without
    # flattering the number
    serve(2)  # compile + warm
    dt = min(serve(24)[0], serve(24)[0])
    tpu_rate = 24 / dt
    sys.stderr.write(f"single-sweep serving loop (host-to-host, depth-3): "
                     f"{tpu_rate:.2f} sweeps/s ({1e3 * dt / 24:.1f} ms/sweep)\n")

    # threaded stream (Detector.predict_stream default): a producer thread
    # pads+uploads+dispatches while this thread pulls results, so the
    # blocking h2d copy overlaps the result download instead of serializing
    # with it — the honest single-sweep serving pattern
    def stream_once():
        t0 = time.perf_counter()
        n_out = sum(1 for _ in det.predict_stream(
            (scenes[i % len(scenes)].points for i in range(24)), depth=3))
        assert n_out == 24
        return time.perf_counter() - t0

    dt_s = min(stream_once(), stream_once())
    stream_rate = 24 / dt_s
    sys.stderr.write(f"single-sweep threaded stream (host-to-host): "
                     f"{stream_rate:.2f} sweeps/s "
                     f"({1e3 * dt_s / 24:.1f} ms/sweep)\n")
    tpu_rate = max(tpu_rate, stream_rate)

    # --- batch-8 path (BASELINE config #2) ---
    B = 8
    pts_b = np.stack([p for p, _ in padded])
    n_b = np.asarray([c for _, c in padded])
    np.asarray(det.predict_packed_batch(pts_b, n_b))  # compile + sync
    reps = 6

    def batch_once():
        t0 = time.perf_counter()
        pending = deque()
        for r in range(reps):
            pending.append(det.predict_packed_batch(pts_b, n_b))
            if len(pending) > 2:
                np.asarray(pending.popleft())
        while pending:
            np.asarray(pending.popleft())
        return time.perf_counter() - t0

    dt_b = min(batch_once(), batch_once())
    batch_rate = reps * B / dt_b
    sys.stderr.write(f"batch-{B} serving loop (host-to-host): {batch_rate:.2f} "
                     f"sweeps/s ({1e3 * dt_b / (reps * B):.1f} ms/sweep)\n")

    # (An int16 fixed-point wire was measured r3 and kept OUT of this
    # bench: this environment's tunnel fast-paths f32 buffers — the int16
    # upload measured 3x SLOWER despite half the bytes — and its ~2 mm
    # quantization rebins cell-border points, drifting boxes more than the
    # opt-in contract promises. See Detector(wire_dtype=jnp.int16).)
    tpu_rate = max(tpu_rate, batch_rate)

    # --- p50 voxelize + NMS-stage latency (BASELINE.json metric) ---
    from tpu_pillars.ops.emit_pallas import pillarize_auto

    pill = jax.jit(lambda p, n: pillarize_auto(p, n, cfg))
    d_pts = [jnp.asarray(p) for p, _ in padded[:6]]
    n0 = padded[0][1]
    o1 = det._model(det.variables, d_pts[0], n0)

    def lat(fn, args_list, iters=15):
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            out = fn(args_list[i % len(args_list)])
            np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])  # true sync
            times.append(time.perf_counter() - t0)
        return float(np.median(times) * 1e3)

    lat(lambda d: pill(d, n0), d_pts, iters=2)  # compile
    p50_vox = lat(lambda d: pill(d, n0), d_pts)
    lat(lambda _: det._post(*o1), [None], iters=2)
    p50_post = lat(lambda _: det._post(*o1), [None])
    sys.stderr.write(f"p50 voxelize latency: {p50_vox:.1f} ms; "
                     f"p50 decode+NMS (postprocess) latency: {p50_post:.1f} ms "
                     f"(incl. ~1-2 RTT dispatch+sync overhead on this link)\n")

    # --- CPU reference baseline ---
    # use the BEST frame time: robust to transient host load, and
    # conservative for the reported speedup ratio
    cpu = CPUReferenceDetector(cfg, flax_to_torch(variables, cfg))
    cpu.predict_raw(scenes[0].points)  # warm caches
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        cpu.predict_raw(scenes[i % len(scenes)].points)
        times.append(time.perf_counter() - t0)
    cpu_dt = min(times)
    cpu_rate = 1.0 / cpu_dt
    sys.stderr.write(f"cpu reference (best of {len(times)}): "
                     f"{cpu_rate:.3f} sweeps/s ({cpu_dt:.2f} s/sweep)\n")

    print(json.dumps({
        "metric": "lidar sweeps/sec/chip e2e (points->boxes)",
        "value": round(tpu_rate, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
