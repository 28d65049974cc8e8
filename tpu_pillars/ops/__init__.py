from tpu_pillars.ops.anchors import make_anchors
from tpu_pillars.ops.bev_pallas import (
    scatter_to_bev_auto, scatter_to_bev_auto_pid, scatter_to_bev_ring,
)
from tpu_pillars.ops.box_coder import encode_boxes, decode_boxes
from tpu_pillars.ops.emit_pallas import (
    pillarize_auto, pillarize_batch_auto, pillarize_batch_emit,
)
from tpu_pillars.ops.fused_pfn import (
    emit_centered_table, fold_decoration, pfn_train_from_table,
    pillarize_pfn_fused,
)
from tpu_pillars.ops.iou import rotated_iou_bev, iou_3d, corners_bev_jax

__all__ = [
    "make_anchors", "encode_boxes", "decode_boxes",
    "rotated_iou_bev", "iou_3d", "corners_bev_jax",
    "pillarize_auto", "pillarize_batch_auto", "pillarize_batch_emit",
    "emit_centered_table", "fold_decoration", "pfn_train_from_table",
    "pillarize_pfn_fused",
    "scatter_to_bev_auto", "scatter_to_bev_auto_pid", "scatter_to_bev_ring",
]
