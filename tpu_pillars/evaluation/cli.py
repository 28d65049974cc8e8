"""Evaluation / submission CLI (SURVEY.md 3.3 `evaluate()` and 3.4
`make_submission()` as a command-line surface):

    python -m tpu_pillars.evaluation.cli --data DIR --ckpt ckpt.msgpack \
        [--submission out.csv] [--dp N] [--full-size] [--num-sweeps K]

Loads a checkpoint into a Detector, scores Lyft mAP (competition protocol,
global frame) over the dataset's samples, prints the per-class AP table,
and optionally writes the Kaggle-format submission CSV.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=str, required=True,
                   help="Lyft-format dataset directory (json table root)")
    p.add_argument("--ckpt", type=str, required=True,
                   help="train checkpoint (train/checkpoint.py msgpack)")
    p.add_argument("--submission", type=str, default=None,
                   help="also write the Kaggle submission CSV here")
    p.add_argument("--out", type=str, default=None,
                   help="write the metrics (mAP + AP table) as JSON here")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--num-sweeps", type=int, default=0,
                   help="accumulate K sweeps per sample (0 = config default:"
                        " config.num_sweeps)")
    p.add_argument("--samples", type=int, default=0,
                   help="evaluate only the first N samples (0 = all)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel eval over the first N local devices "
                        "(shard_map detector + tiled all_gather)")
    p.add_argument("--full-size", action="store_true",
                   help="full 400x400 config instead of the tiny config")
    p.add_argument("--tta", action="store_true",
                   help="flip test-time augmentation: ensemble the 4 BEV "
                        "flip views per sample (4x the device passes)")
    p.add_argument("--tta-merge", choices=("nms", "wbf"), default="wbf",
                   help="TTA merge: weighted box fusion (score-weighted "
                        "averaging; default — measured +2.6 mAP on a "
                        "trained model where the NMS merge measured -2.2, "
                        "see evaluation/tta.py) or class-aware NMS")
    p.add_argument("--lidar-frame", action="store_true",
                   help="score in each keyframe's lidar frame instead of "
                        "the competition's global frame")
    p.add_argument("--platform", choices=("auto", "cpu"), default="auto",
                   help="'cpu' pins the CPU backend before first device use")
    p.add_argument("--match-rule", choices=("mask_argmax", "argmax_check"),
                   default="mask_argmax",
                   help="greedy-match protocol corner (docs/MAP_PROTOCOL.md "
                        "row 6): best UNMATCHED GT (default) vs the VOC "
                        "lineage's argmax-then-check")
    p.add_argument("--tie-order", choices=("stable", "numpy", "reversed"),
                   default="stable",
                   help="score-tie visit order (MAP_PROTOCOL.md row 7)")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from tpu_pillars.config import PillarsConfig, tiny_config
    from tpu_pillars.data.lyft import LyftDataset
    from tpu_pillars.detector import Detector
    from tpu_pillars.evaluation.pipeline import evaluate_dataset

    config = PillarsConfig() if args.full_size else tiny_config()
    det = Detector.from_checkpoint(config, args.ckpt)
    ds = LyftDataset(args.data)

    mesh = None
    if args.dp > 1:
        from tpu_pillars.parallel import make_mesh_n

        mesh = make_mesh_n(args.dp)

    tokens = list(ds.sample_tokens())
    if args.samples > 0:
        tokens = tokens[: args.samples]
    num_sweeps = args.num_sweeps or config.num_sweeps

    tta_modes = None
    if args.tta:
        from tpu_pillars.evaluation.tta import MODES as tta_modes

    mAP, table, predictions = evaluate_dataset(
        det, ds, sample_tokens=tokens, num_sweeps=num_sweeps,
        global_frame=not args.lidar_frame, batch_size=args.batch,
        mesh=mesh, tta_modes=tta_modes, tta_merge=args.tta_merge,
        match_rule=args.match_rule, tie_order=args.tie_order)

    import numpy as np

    print(f"samples: {len(tokens)}   backend: {jax.default_backend()}"
          + (f"   dp: {mesh.devices.size}" if mesh is not None else ""))
    # table: {iou_threshold: per-class AP array (NaN = class absent in GT)}
    import warnings

    with warnings.catch_warnings():
        # all-NaN columns (class absent at every threshold) are expected —
        # they get the "(no GT)" tag below, not a RuntimeWarning
        warnings.simplefilter("ignore", RuntimeWarning)
        per_class = np.nanmean(np.stack(list(table.values())), axis=0)
    for name, ap50, ap in zip(config.class_names, table[0.5], per_class):
        tag = "   (no GT)" if np.isnan(ap) else ""
        print(f"  {name:>18s}  AP@0.5 {np.nan_to_num(ap50):.4f}  "
              f"AP@0.5:0.95 {np.nan_to_num(ap):.4f}{tag}")
    print(f"Lyft mAP(0.5:0.95) = {mAP:.4f}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"mAP": mAP,
                       "ap": {str(t): [None if np.isnan(a) else float(a)
                                       for a in aps]
                              for t, aps in table.items()},
                       "class_names": list(config.class_names),
                       "num_samples": len(tokens)}, f, indent=2)
    if args.submission:
        from tpu_pillars.data.submission import write_submission

        write_submission(args.submission, predictions)
        print(f"submission: {args.submission} ({len(predictions)} samples)")


if __name__ == "__main__":
    main()
