#!/usr/bin/env python
"""Build the ~1000-sample on-disk Lyft-format dress-rehearsal dataset
(VERDICT r4 next-round #5): the REAL CLI data path at realistic scale —
disk .bin sweeps + JSON tables through data.lyft.LyftDataset — so host
dataloader throughput on the 1-core host can be measured against the
187-284 ms/step TPU train loop instead of discovered as a day-one failure
on real data.

Pure NumPy/host — safe to run next to a TPU process (slows it, nothing
more). ~1.3 GB on disk at the default density (~33k pts/sweep; real Lyft
sweeps are ~100k but the tunnel-fed TPU step is the same shape either way —
the loader cost scales linearly and is reported per-sweep).

Usage: python scripts/rehearsal_dataset.py --root /tmp/lyft1k
Then:  python -m tpu_pillars.train.loop --full-size --data /tmp/lyft1k ...
       python -m tpu_pillars.evaluation.cli --data /tmp/lyft1k --ckpt ...
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_pillars.config import PillarsConfig  # noqa: E402
from tpu_pillars.data.fixture import build_fixture  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="/tmp/lyft1k")
    p.add_argument("--scenes", type=int, default=100)
    p.add_argument("--samples-per-scene", type=int, default=10)
    p.add_argument("--sweeps-per-sample", type=int, default=2)
    p.add_argument("--num-objects", type=int, default=25)
    p.add_argument("--points-per-object", type=int, default=300)
    p.add_argument("--clutter", type=int, default=25000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    t0 = time.perf_counter()
    build_fixture(args.root, PillarsConfig(),
                  num_scenes=args.scenes,
                  samples_per_scene=args.samples_per_scene,
                  sweeps_per_sample=args.sweeps_per_sample,
                  seed=args.seed,
                  num_objects=args.num_objects,
                  points_per_object=args.points_per_object,
                  clutter=args.clutter)
    dt = time.perf_counter() - t0
    n_samples = args.scenes * args.samples_per_scene
    size = 0
    for dirpath, _, files in os.walk(args.root):
        size += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    print(f"built {n_samples} samples ({args.sweeps_per_sample} sweeps each) "
          f"at {args.root}: {size / 1e9:.2f} GB in {dt:.0f} s "
          f"({n_samples / dt:.1f} samples/s)")


if __name__ == "__main__":
    main()
