"""Faithful CPU reference pipeline (SURVEY.md section 7 step 2 / BASELINE.md).

This subpackage reproduces the reference repo's operating mode — host-side
NumPy pillarization, torch-CPU PointPillars forward, NumPy rotated NMS — under
this framework's canonical semantics. It serves two roles:

1. **The measured baseline**: `bench.py` times this path; the TPU pipeline's
   `vs_baseline` speedup is computed against it (BASELINE.json north-star:
   >=10x sweeps/sec/chip).
2. **The golden oracle**: fidelity tests assert the jitted TPU pipeline
   produces the same boxes from the same weights (bit-for-boxes contract).
"""

from tpu_pillars.reference_cpu.pillarizer import pillarize_np
from tpu_pillars.reference_cpu.postprocess import (
    decode_boxes_np, rotated_nms_np, rotated_iou_bev_np,
)
from tpu_pillars.reference_cpu.pipeline import CPUReferenceDetector

__all__ = [
    "pillarize_np", "decode_boxes_np", "rotated_nms_np", "rotated_iou_bev_np",
    "CPUReferenceDetector",
]
