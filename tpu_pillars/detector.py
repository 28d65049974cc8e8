"""Detector — the public inference API (SURVEY.md L5: THE public API is
``dataset sample -> List[Box3D]`` with class/score/yaw).

The whole points -> pillars -> BEV -> RPN -> decode -> NMS pipeline is ONE
jitted XLA program per the BASELINE.json north-star: the only host<->device
transfers per frame are the padded point cloud in and the fixed-size
detection set out. Batched inference vmaps the same program over sweeps.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import PillarsConfig
from tpu_pillars.geometry.boxes import Box3D
from tpu_pillars.geometry.transforms import Pose, transform_points
from tpu_pillars.models.pointpillars import PointPillars
from tpu_pillars.ops.anchors import make_anchors
from tpu_pillars.ops.postprocess import Detections, postprocess
from tpu_pillars.ops.voxelize import pillarize


def build_forward_fn(config: PillarsConfig, dtype=jnp.float32):
    """Returns f(variables, points (M, F), num_points) -> Detections.

    Pure function — compose with jit / vmap / shard_map as needed.
    """
    model = PointPillars(config, dtype=dtype)
    anchors, anchor_cls = make_anchors(config)
    anchors_j = jnp.asarray(anchors)
    anchor_cls_j = jnp.asarray(anchor_cls)

    def forward(variables, points, num_points) -> Detections:
        batch = pillarize(points, num_points, config)
        cls_logits, box_deltas, dir_logits = model.apply(variables, batch)
        return postprocess(
            cls_logits.astype(jnp.float32),
            box_deltas.astype(jnp.float32),
            dir_logits.astype(jnp.float32),
            anchors_j, anchor_cls_j, config,
        )

    return forward


class Detector:
    """Host-facing wrapper: pads clouds to the static budget, runs the jitted
    pipeline, converts to Box3D (optionally into the global frame)."""

    def __init__(self, config: PillarsConfig, variables, dtype=jnp.float32):
        config.validate()
        self.config = config
        self.variables = variables
        self._forward = jax.jit(build_forward_fn(config, dtype=dtype))
        self._forward_batch = jax.jit(
            jax.vmap(build_forward_fn(config, dtype=dtype), in_axes=(None, 0, 0))
        )

    # --- raw (device arrays, static shapes) ---

    def pad_points(self, points: np.ndarray):
        cfg = self.config
        m = cfg.max_points
        n_feat = points.shape[1] if points.size else cfg.num_raw_features
        out = np.full((m, n_feat), 1e6, dtype=np.float32)
        n = min(len(points), m)
        out[:n] = points[:n]
        return out, np.int32(n)

    def predict_raw(self, points: np.ndarray) -> Detections:
        padded, n = self.pad_points(points)
        return self._forward(self.variables, jnp.asarray(padded), n)

    def predict_raw_batch(self, points_batch, num_points) -> Detections:
        """points_batch (B, M, F) already padded; num_points (B,)."""
        return self._forward_batch(self.variables, points_batch, num_points)

    # --- public API: points -> List[Box3D] ---

    def predict(self, points: np.ndarray, token: str = "",
                lidar_to_global: Optional[Pose] = None) -> List[Box3D]:
        det = jax.tree.map(np.asarray, self.predict_raw(points))
        return detections_to_boxes(det, self.config, token=token,
                                   lidar_to_global=lidar_to_global)


def detections_to_boxes(det: Detections, config: PillarsConfig, token: str = "",
                        lidar_to_global: Optional[Pose] = None) -> List[Box3D]:
    names = config.class_names
    out: List[Box3D] = []
    for b, s, c, v in zip(det.boxes, det.scores, det.class_ids, det.valid):
        if not v:
            continue
        box = Box3D.from_array(np.asarray(b), label=names[int(c)],
                               score=float(s), token=token)
        if lidar_to_global is not None:
            box = box.transformed(lidar_to_global.rotation,
                                  lidar_to_global.translation)
        out.append(box)
    return out
