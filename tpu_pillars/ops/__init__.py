from tpu_pillars.ops.anchors import make_anchors
from tpu_pillars.ops.box_coder import encode_boxes, decode_boxes
from tpu_pillars.ops.iou import rotated_iou_bev, iou_3d, corners_bev_jax

__all__ = [
    "make_anchors", "encode_boxes", "decode_boxes",
    "rotated_iou_bev", "iou_3d", "corners_bev_jax",
]
