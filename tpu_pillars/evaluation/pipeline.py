"""Evaluation glue (SURVEY.md 3.3): run the detector over a dataset split,
collect predictions + GT as EvalBox lists (one common frame), compute Lyft
mAP. Optionally data-parallel over a mesh via parallel.eval_dp.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


from tpu_pillars.data.lyft import LyftDataset
from tpu_pillars.detector import Detector, packed_to_boxes
from tpu_pillars.evaluation.map_eval import EvalBox, lyft_map
from tpu_pillars.geometry.boxes import Box3D


def evaluate_dataset(
    det: Detector, dataset: LyftDataset,
    sample_tokens: Optional[Sequence[str]] = None,
    num_sweeps: int = 1, global_frame: bool = True,
) -> Tuple[float, Dict, Dict[str, List[Box3D]]]:
    """Predict every sample; score against the dataset's GT.

    Returns (mAP, per-threshold AP table, {token: predicted boxes}).
    Evaluation happens in the global frame when `global_frame` (the
    competition protocol) else in each keyframe's lidar frame.
    """
    cfg = det.config
    tokens = list(sample_tokens or dataset.sample_tokens())
    gt_boxes: List[EvalBox] = []
    pred_boxes: List[EvalBox] = []
    predictions: Dict[str, List[Box3D]] = {}

    for tok in tokens:
        sd = dataset.lidar_sample_data(tok)
        if num_sweeps > 1:
            cloud = dataset.load_sweeps(tok, num_sweeps)
            pts = np.concatenate(
                [cloud[:, : cfg.num_raw_features], cloud[:, 5:6]], axis=1
            ) if cfg.num_sweeps > 1 else cloud[:, : cfg.num_raw_features]
        else:
            pts = dataset.load_point_cloud(sd)[:, : cfg.num_raw_features]

        l2g = dataset.lidar_to_global(sd) if global_frame else None
        boxes = packed_to_boxes(np.asarray(det.predict_packed(pts)), cfg,
                                token=tok, lidar_to_global=l2g)
        predictions[tok] = boxes
        pred_boxes.extend(EvalBox.from_box3d(b) for b in boxes)

        gts = (dataset.get_boxes_global(tok) if global_frame
               else dataset.get_boxes_lidar(tok))
        gt_boxes.extend(EvalBox.from_box3d(g) for g in gts)

    mAP, table = lyft_map(gt_boxes, pred_boxes, cfg.class_names)
    return mAP, table, predictions
