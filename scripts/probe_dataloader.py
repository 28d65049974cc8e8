#!/usr/bin/env python
"""Host-side dataloader throughput probe (VERDICT r4 weak #5 / next #5).

Measures the REAL --data train path in isolation on the 1-core host: disk
.bin loads + JSON-table joins + GT-database sampling + per-object noise +
global augmentation + CBGS resampling, batched exactly as train.loop wires
it — no TPU, no model. Prints batches/s and ms/batch so starvation against
the ~190-290 ms/step TPU train loop is a number, not a surprise.

Pure host (pins jax to CPU and never builds a model) — safe next to a TPU
process, but for clean numbers run it alone.

Usage: python scripts/probe_dataloader.py --data /tmp/lyft1k \
           [--batches 40] [--workers 4] [--gt-sample 10] [--cbgs 0.5]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/lyft1k")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--max-gt", type=int, default=64)
    ap.add_argument("--gt-sample", type=int, default=0)
    ap.add_argument("--cbgs", type=float, default=0.0)
    ap.add_argument("--object-noise", action="store_true")
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--prefetch", type=int, default=2)
    args = ap.parse_args()

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.augment import AugmentConfig, ObjectNoiseConfig
    from tpu_pillars.data.lyft import LyftDataset
    from tpu_pillars.train.data import dataset_batches
    from tpu_pillars.train.prefetch import prefetch

    cfg = PillarsConfig()
    ds = LyftDataset(args.data)
    tokens = list(ds.sample_tokens())
    print(f"dataset: {len(tokens)} samples at {args.data}")

    gt_sampler = None
    if args.gt_sample:
        from tpu_pillars.data.gt_sampler import (
            GTDatabase, GTSampleConfig, GTSampler,
        )

        t0 = time.perf_counter()
        db = GTDatabase.from_dataset(ds, cfg, tokens=tokens)
        gt_sampler = GTSampler(
            db, GTSampleConfig(target_per_class=args.gt_sample))
        print(f"GT database build: {time.perf_counter() - t0:.1f} s")

    if args.cbgs > 0:
        from tpu_pillars.train.data import class_balanced_tokens

        t0 = time.perf_counter()
        tokens = class_balanced_tokens(ds, cfg, tokens=tokens, seed=0,
                                       ratio=args.cbgs)
        print(f"CBGS resample: {len(tokens)} tokens "
              f"({time.perf_counter() - t0:.1f} s)")

    it = dataset_batches(
        ds, cfg, batch_size=args.batch, max_gt_boxes=args.max_gt,
        tokens=tokens,
        augment=None if args.no_augment else AugmentConfig(),
        object_noise=ObjectNoiseConfig() if args.object_noise else None,
        gt_sampler=gt_sampler, seed=0, num_workers=args.workers)
    it = prefetch(it, size=args.prefetch)

    # warm (first batch pays table/open costs)
    t0 = time.perf_counter()
    next(iter_ := iter(it))
    warm = time.perf_counter() - t0

    times = []
    t_prev = time.perf_counter()
    for i, b in enumerate(iter_):
        if i >= args.batches:
            break
        now = time.perf_counter()
        times.append(now - t_prev)
        t_prev = now
    times = np.asarray(times)
    print(f"first batch (cold): {warm * 1e3:.0f} ms")
    print(f"{len(times)} batches (b{args.batch}, workers={args.workers}): "
          f"mean {times.mean() * 1e3:.0f} ms/batch, p50 "
          f"{np.percentile(times, 50) * 1e3:.0f}, p90 "
          f"{np.percentile(times, 90) * 1e3:.0f} -> "
          f"{1.0 / times.mean():.2f} batches/s "
          f"({args.batch / times.mean():.1f} samples/s)")


if __name__ == "__main__":
    main()
