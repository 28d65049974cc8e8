#!/usr/bin/env python
"""Render a BEV PNG of a scene: lidar density + GT boxes (green) +
predictions (class-colored), via tpu_pillars.utils.viz.

    # synthetic scene, GT only (no model, runs anywhere, <1 s):
    python scripts/visualize.py --out /tmp/scene.png

    # with predictions from a trained checkpoint:
    python scripts/visualize.py --checkpoint ckpt.msgpack --out /tmp/scene.png

    # first sample of a Lyft-format dataset directory:
    python scripts/visualize.py --data /path/to/lyft --out /tmp/scene.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, default="/tmp/tpu_pillars_scene.png")
    p.add_argument("--data", type=str, default=None,
                   help="Lyft-format dataset dir (default: synthetic scene)")
    p.add_argument("--sample", type=int, default=0,
                   help="sample index within --data")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="train checkpoint to run predictions from")
    p.add_argument("--tiny", action="store_true",
                   help="tiny_config (matches tiny checkpoints; CPU-fast)")
    p.add_argument("--size", type=int, default=1000, help="image side (px)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from tpu_pillars.config import PillarsConfig, tiny_config
    from tpu_pillars.utils.viz import render_scene, save_png

    cfg = tiny_config() if args.tiny else PillarsConfig()

    if args.data is not None:
        from tpu_pillars.data.lyft import LyftDataset

        ds = LyftDataset(args.data)
        token = ds.sample_tokens()[args.sample]
        if cfg.num_sweeps > 1:
            points = ds.load_sweeps(token, cfg.num_sweeps)
        else:
            points = ds.load_point_cloud(ds.lidar_sample_data(token))
        gt_boxes = ds.get_boxes_lidar(token)   # List[Box3D], lidar frame
        print(f"sample {token}: {len(points)} points, "
              f"{len(gt_boxes)} GT boxes")
    else:
        from tpu_pillars.data.synthetic import make_scene

        rng = np.random.default_rng(args.seed)
        scene = make_scene(rng, cfg, num_objects=24, points_per_object=200,
                           clutter=40000 if not args.tiny else 2000)
        points, gt_boxes = scene.points, scene.gt_boxes
        print(f"synthetic scene: {len(points)} points, "
              f"{len(gt_boxes)} GT boxes")

    pred_boxes = pred_cls = None
    if args.checkpoint is not None:
        from tpu_pillars.detector import Detector

        det = Detector.from_checkpoint(cfg, args.checkpoint)
        packed = np.asarray(det.predict_packed(points))
        keep = packed[:, 9] > 0
        pred_boxes = packed[keep, :7]
        pred_cls = packed[keep, 8].astype(int)
        print(f"{keep.sum()} detections "
              f"(score p50 {np.median(packed[keep, 7]):.3f})"
              if keep.any() else "0 detections")

    img = render_scene(points, pred_boxes=pred_boxes, gt_boxes=gt_boxes,
                       config=cfg, size=(args.size, args.size),
                       pred_class_ids=pred_cls)
    save_png(args.out, img)
    print(f"wrote {args.out} ({img.shape[1]}x{img.shape[0]})")


if __name__ == "__main__":
    main()
