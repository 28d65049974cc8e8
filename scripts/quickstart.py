#!/usr/bin/env python
"""End-to-end quickstart: build a tiny on-disk Lyft-format dataset, train
briefly, evaluate Lyft mAP, write a Kaggle submission CSV.

    python scripts/quickstart.py --steps 200 --out /tmp/quickstart

Runs on whatever backend jax picks (CPU works; tiny config). This exercises
every tier of the framework: dataset adapter -> native loader -> jitted
train step (pillarize + assign + fwd/bwd) -> checkpoint -> staged jitted
inference -> global-frame mAP -> submission writer.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--out", type=str, default="/tmp/tpu_pillars_quickstart")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gt-sample", type=int, default=0, metavar="TARGET",
                   help="enable GT-database sampling augmentation with this "
                        "per-class instance target (0 = off)")
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; this uses the config key, which "
                        "works when set before first backend use)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpu_pillars.config import tiny_config
    from tpu_pillars.data.fixture import build_fixture
    from tpu_pillars.data.lyft import LyftDataset
    from tpu_pillars.data.submission import write_submission
    from tpu_pillars.detector import Detector
    from tpu_pillars.evaluation.pipeline import evaluate_dataset
    from tpu_pillars.train import (
        TrainConfig, create_train_state, save_checkpoint,
    )
    from tpu_pillars.train.data import dataset_batches
    from tpu_pillars.train.loop import fit
    from tpu_pillars.utils.logging import JsonlLogger

    cfg = tiny_config()
    print(f"backend: {jax.default_backend()}")

    print("1/5 building fixture dataset ...")
    json_dir = build_fixture(os.path.join(args.out, "dataset"), cfg,
                             num_scenes=2, samples_per_scene=3,
                             sweeps_per_sample=1, seed=args.seed)
    ds = LyftDataset(json_dir)
    tokens = ds.sample_tokens()
    print(f"    {len(tokens)} samples, "
          f"{sum(len(ds.get_boxes_lidar(t)) for t in tokens)} GT boxes")

    gt_sampler = None
    if args.gt_sample > 0:
        from tpu_pillars.data.gt_sampler import (
            GTDatabase, GTSampleConfig, GTSampler,
        )

        db = GTDatabase.from_dataset(ds, cfg)
        gt_sampler = GTSampler(
            db, GTSampleConfig(target_per_class=args.gt_sample))
        print(f"    GT-sampling on: db per-class counts {db.counts()}")

    print(f"2/5 training {args.steps} steps (batch {args.batch}) ...")
    tcfg = TrainConfig(learning_rate=args.lr, total_steps=args.steps,
                       batch_size=args.batch, max_gt_boxes=8)
    state = create_train_state(cfg, tcfg,
                               rng_key=jax.random.PRNGKey(args.seed))
    with JsonlLogger(os.path.join(args.out, "train.jsonl"), echo=True) as lg:
        state = fit(state,
                    dataset_batches(ds, cfg, tcfg.batch_size,
                                    tcfg.max_gt_boxes, seed=args.seed,
                                    gt_sampler=gt_sampler, num_workers=2),
                    steps=args.steps, config=cfg, logger=lg,
                    log_every=max(args.steps // 5, 1))

    ckpt = os.path.join(args.out, "ckpt.msgpack")
    save_checkpoint(ckpt, state)
    print(f"3/5 checkpoint -> {ckpt}")

    print("4/5 evaluating Lyft mAP over the fixture ...")
    det = Detector(cfg, state.variables)
    mAP, table, preds = evaluate_dataset(det, ds)
    per_cls = table[0.5]
    print(f"    mAP(0.5:0.95) = {mAP:.3f}   AP@0.5 per class: "
          + ", ".join(f"{n}={a:.2f}" for n, a in zip(cfg.class_names, per_cls)
                      if a == a))

    sub = os.path.join(args.out, "submission.csv")
    write_submission(sub, preds)
    print(f"5/5 submission -> {sub}")


if __name__ == "__main__":
    main()
