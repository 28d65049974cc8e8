#!/usr/bin/env python
"""Bucketed upload shapes on the batch-8 host-to-host serving loop,
same-process A/B/A (full config, bench.py's scene mix ~102k points/sweep).

The batch-8 serving path is transfer-bound through this environment's
~30-60 MB/s tunnel (CLAUDE.md): every batch uploads the full static
(8, 131072, 4) f32 buffer (16.8 MB) even though the scenes occupy ~102k
rows. wire_buckets pads each sweep to the smallest static bucket instead;
a 16384-spaced grid puts bench's scenes in the 114688 bucket (14.7 MB,
-12.5%). Boxes are bit-equal by test (test_detector_e2e.py batch+single).

This probe ranks: full-buffer control A, bucketed, full-buffer control B,
on BOTH the batch-8 loop and the single-sweep threaded stream.
"""
from __future__ import annotations

import json
import sys
import time
from collections import deque

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene
    from tpu_pillars.detector import Detector
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
    scenes = [make_scene(rng, cfg, num_objects=40, points_per_object=300,
                         clutter=90000) for _ in range(8)]
    sys.stderr.write(f"points/sweep={[len(s.points) for s in scenes]}\n")

    buckets = tuple(range(16384, cfg.max_points + 1, 16384))
    det_full = Detector(cfg, variables)
    det_buck = Detector(cfg, variables, wire_buckets=buckets)
    results = {}

    def batch_rate(det, tag, reps=8):
        padded = [det.pad_points(s.points) for s in scenes]
        m = {p.shape[0] for p, _ in padded}
        assert len(m) == 1, m
        pts_b = np.stack([p for p, _ in padded])
        n_b = np.asarray([c for _, c in padded])
        np.asarray(det.predict_packed_batch(pts_b, n_b))  # compile+sync
        t0 = time.perf_counter()
        pending = deque()
        for _ in range(reps):
            pending.append(det.predict_packed_batch(pts_b, n_b))
            if len(pending) > 2:
                np.asarray(pending.popleft())
        while pending:
            np.asarray(pending.popleft())
        dt = time.perf_counter() - t0
        rate = reps * 8 / dt
        results[tag] = round(rate, 2)
        sys.stderr.write(f"{tag}: {rate:.2f} sweeps/s "
                         f"({1e3 * dt / (reps * 8):.1f} ms/sweep, "
                         f"upload {pts_b.nbytes / 1e6:.1f} MB)\n")

    def stream_rate(det, tag, iters=24):
        next(iter(det.predict_stream([scenes[0].points])))  # warm
        t0 = time.perf_counter()
        n_out = sum(1 for _ in det.predict_stream(
            (scenes[i % len(scenes)].points for i in range(iters)), depth=3))
        dt = time.perf_counter() - t0
        assert n_out == iters
        results[tag] = round(iters / dt, 2)
        sys.stderr.write(f"{tag}: {iters / dt:.2f} sweeps/s\n")

    batch_rate(det_full, "batch8_full_A")
    batch_rate(det_buck, "batch8_bucketed")
    batch_rate(det_full, "batch8_full_B")
    stream_rate(det_full, "stream_full_A")
    stream_rate(det_buck, "stream_bucketed")
    stream_rate(det_full, "stream_full_B")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
