#!/usr/bin/env python
"""GT-database sampling ablation: does paste-injecting a rare class during
training improve that class's AP? (VERDICT round-2 item 8's demonstration.)

Controlled synthetic setup: the training pool is mostly car-only scenes;
pedestrians appear in just 2 of 12 scenes. The GT sampler injects stored
pedestrians into every scene (collision-checked). Both runs train the same
steps on the same seeds; eval is on held-out scenes containing both
classes.

    python scripts/gt_sampling_ablation.py --steps 2000 --cpu

Measured (CPU backend, tiny config, seed 0, 2026-08-17):
  600 steps: neither run learns much (car AP 0.007 vs 0.089) — too short.
  2000 steps: pedestrian AP 0.000 -> 0.215 with sampling (car 0.033 ->
  0.047): the rare class is unlearnable from 3 instances without
  augmentation and clearly learnable with it.

Three-way --cbgs run (same protocol, seed 0, 2026-08-20; round-3 VERDICT
next-round #2):
                 ped AP   car AP
  baseline        0.000    0.030
  cbgs            0.000    0.014
  gt-sampling     0.238    0.140
CBGS alone moves NOTHING here, honestly: resampling gives ped-holder
scenes 7/12 of the draw share, but the pool still contains only 3
pedestrian instances — replaying them adds no diversity, while paste
injection synthesizes new contexts per scene. CBGS's claimed value
(arXiv:1908.09492) is at dataset scale where the rare class has many
scenes to rebalance TOWARD; this micro-benchmark can demonstrate the
mechanism (draw shares flatten — printed above) but not that gain, and
the AP row is the evidence that it is no substitute for GT sampling on
sparse rare classes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--target", type=int, default=3,
                   help="per-scene pedestrian target for the sampler")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--cbgs", action="store_true",
                   help="also run a CBGS arm (scene-level class-balanced "
                        "resampling via train.data.class_balanced_tokens, "
                        "no GT-database injection) for a three-way "
                        "comparison")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpu_pillars.config import tiny_config
    from tpu_pillars.data.gt_sampler import (
        GTDatabase, GTSampleConfig, GTSampler,
    )
    from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
    from tpu_pillars.detector import Detector
    from tpu_pillars.evaluation.map_eval import EvalBox, lyft_map
    from tpu_pillars.train import (
        TrainBatch, TrainConfig, create_train_state,
    )
    from tpu_pillars.train.loop import fit

    cfg = tiny_config()
    CAR, PED = 0, 7
    rng = np.random.default_rng(args.seed)

    # training pool: cars everywhere, pedestrians in only 2/12 scenes
    train_scenes = [make_scene(rng, cfg, num_objects=3,
                               points_per_object=200, clutter=300,
                               class_subset=[CAR]) for _ in range(10)]
    train_scenes += [make_scene(rng, cfg, num_objects=3,
                                points_per_object=200, clutter=300,
                                class_subset=[CAR, PED]) for _ in range(2)]
    n_ped = sum(int((s.gt_classes == PED).sum()) for s in train_scenes)
    print(f"train pool: {len(train_scenes)} scenes, "
          f"{sum(len(s.gt_boxes) for s in train_scenes)} boxes, "
          f"{n_ped} pedestrians")

    eval_rng = np.random.default_rng(args.seed + 1000)
    eval_scenes = [make_scene(eval_rng, cfg, num_objects=4,
                              points_per_object=200, clutter=300,
                              class_subset=[CAR, PED]) for _ in range(6)]

    db = GTDatabase.from_scenes(train_scenes, cfg.num_classes)
    print(f"gt database per-class counts: {db.counts()}")

    def batches(sampler, seed):
        brng = np.random.default_rng(seed)
        while True:
            idx = brng.choice(len(train_scenes), args.batch, replace=False)
            scenes = [train_scenes[i] for i in idx]
            if sampler is not None:
                aug = []
                for s in scenes:
                    pts, gb, gc = sampler(brng, s.points, s.gt_boxes,
                                          s.gt_classes, max_total=8)
                    aug.append(type(s)(pts, gb, gc, []))
                scenes = aug
            yield TrainBatch(*scenes_to_train_batch(scenes, cfg, 8))

    def run(label, batch_iter):
        tcfg = TrainConfig(learning_rate=args.lr, total_steps=args.steps,
                           batch_size=args.batch, max_gt_boxes=8)
        state = create_train_state(cfg, tcfg,
                                   rng_key=jax.random.PRNGKey(args.seed))
        state = fit(state, batch_iter, steps=args.steps,
                    config=cfg, log_every=max(args.steps // 4, 1))
        det = Detector(cfg, state.variables)
        gt, preds = [], []
        for i, scene in enumerate(eval_scenes):
            tok = f"e{i}"
            for b, c in zip(scene.gt_boxes, scene.gt_classes):
                gt.append(EvalBox(tok, cfg.class_names[c],
                                  np.asarray(b, np.float64)))
            for box in det.predict(scene.points, token=tok):
                preds.append(EvalBox.from_box3d(box))
        mAP, table = lyft_map(gt, preds, cfg.class_names,
                              iou_thresholds=(0.3, 0.5))
        ped_ap = (table[0.3][PED] + table[0.5][PED]) / 2
        car_ap = (table[0.3][CAR] + table[0.5][CAR]) / 2
        print(f"{label}: mAP(0.3,0.5)={mAP:.3f}  "
              f"car AP={car_ap:.3f}  pedestrian AP={ped_ap:.3f}")
        return ped_ap, car_ap

    ped_base, car_base = run("baseline (no sampling)  ",
                             batches(None, args.seed + 7))
    sampler = GTSampler(db, GTSampleConfig(
        target_per_class={PED: args.target}))
    ped_gts, car_gts = run(f"gt-sampling (target {args.target})",
                           batches(sampler, args.seed + 7))
    print(f"\npedestrian AP: {ped_base:.3f} -> {ped_gts:.3f} "
          f"({'+' if ped_gts >= ped_base else ''}{ped_gts - ped_base:.3f}); "
          f"car AP: {car_base:.3f} -> {car_gts:.3f}")

    if args.cbgs:
        # CBGS arm: duck-typed facade over the in-memory scene list so the
        # REAL train.data.class_balanced_tokens is what gets measured —
        # pedestrian-holding scenes get an equal draw share with car-only
        # ones instead of 2/12 of it
        from tpu_pillars.train.data import class_balanced_tokens

        class _B:
            def __init__(self, label):
                self.label = label

        class _ScenePool:
            def sample_tokens(self):
                return [str(i) for i in range(len(train_scenes))]

            def get_boxes_lidar(self, tok):
                s = train_scenes[int(tok)]
                return [_B(cfg.class_names[int(c)]) for c in s.gt_classes]

        pool = [int(t) for t in class_balanced_tokens(
            _ScenePool(), cfg, seed=args.seed, ratio=1.0)]
        n_ped_pool = sum(1 for i in pool
                         if (train_scenes[i].gt_classes == PED).any())
        print(f"\ncbgs pool: {len(pool)} draws, {n_ped_pool} hold "
              f"pedestrians (raw pool: 2/{len(train_scenes)})")

        def cbgs_batches(seed):
            brng = np.random.default_rng(seed)
            while True:
                # with replacement: matches CBGS's with-replacement draw
                # semantics and never raises when --batch exceeds the pool
                idx = brng.choice(len(pool), args.batch, replace=True)
                yield TrainBatch(*scenes_to_train_batch(
                    [train_scenes[pool[i]] for i in idx], cfg, 8))

        ped_cb, car_cb = run("cbgs (balanced resample) ",
                             cbgs_batches(args.seed + 7))
        print(f"pedestrian AP: baseline {ped_base:.3f} / cbgs {ped_cb:.3f} "
              f"/ gt-sampling {ped_gts:.3f}; car AP: {car_base:.3f} / "
              f"{car_cb:.3f} / {car_gts:.3f}")


if __name__ == "__main__":
    main()
