"""CPU reference detector: the reference repo's full inference call stack
(SURVEY.md 3.1) on host — NumPy pillarize, torch-CPU forward, NumPy decode +
rotated NMS -> List[Box3D]. This is what bench.py times as the baseline.
"""

from __future__ import annotations

from typing import List

import numpy as np
import torch

from tpu_pillars.config import PillarsConfig
from tpu_pillars.geometry.boxes import Box3D
from tpu_pillars.ops.anchors import make_anchors
from tpu_pillars.reference_cpu.model import TorchPointPillars
from tpu_pillars.reference_cpu.pillarizer import pillarize_np
from tpu_pillars.reference_cpu.postprocess import postprocess_np


class CPUReferenceDetector:
    def __init__(self, config: PillarsConfig, torch_state_dict: dict | None = None):
        self.config = config
        self.model = TorchPointPillars(config)
        if torch_state_dict is not None:
            self.model.load_state_dict(torch_state_dict)
        self.model.eval()
        self.anchors, self.anchor_cls = make_anchors(config)

    @torch.no_grad()
    def predict_raw(self, points: np.ndarray):
        """points (n, F) -> (boxes (m, 7), scores (m,), class_ids (m,))."""
        feats, mask, coords, pillar_mask = pillarize_np(points, self.config)
        cls_logits, box_deltas, dir_logits = self.model(
            torch.from_numpy(feats),
            torch.from_numpy(mask),
            torch.from_numpy(coords),
            torch.from_numpy(pillar_mask),
        )
        return postprocess_np(
            cls_logits.numpy(), box_deltas.numpy(), dir_logits.numpy(),
            self.anchors, self.anchor_cls, self.config,
        )

    def predict(self, points: np.ndarray, token: str = "") -> List[Box3D]:
        boxes, scores, class_ids = self.predict_raw(points)
        names = self.config.class_names
        return [
            Box3D.from_array(b, label=names[int(c)], score=float(s), token=token)
            for b, s, c in zip(boxes, scores, class_ids)
        ]
