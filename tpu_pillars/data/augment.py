"""Training-time data augmentation (the reference lineage's standard global
augmentations for PointPillars-family training: random flip, global rotation,
global scaling, global translation — applied consistently to the cloud and
the GT boxes). Host-side NumPy on raw scenes, before padding/pillarization.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    flip_y_prob: float = 0.5          # mirror across the x axis (y -> -y)
    rotation_range: float = np.pi / 4  # global yaw in [-r, r]
    scale_range: Tuple[float, float] = (0.95, 1.05)
    translate_std: float = 0.2         # metres, per axis (x, y, z)


def augment_scene(rng: np.random.Generator, points: np.ndarray,
                  gt_boxes: np.ndarray, cfg: AugmentConfig = AugmentConfig()):
    """points (N, >=3), gt_boxes (G, 7) -> augmented copies.

    Feature columns beyond xyz (intensity, dt) pass through untouched.
    """
    points = np.array(points, dtype=np.float32, copy=True)
    gt_boxes = np.array(gt_boxes, dtype=np.float32, copy=True)

    # global flip across x axis: y -> -y, yaw -> -yaw
    if rng.uniform() < cfg.flip_y_prob:
        points[:, 1] = -points[:, 1]
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]

    # global rotation about +z
    theta = rng.uniform(-cfg.rotation_range, cfg.rotation_range)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]], dtype=np.float32)
    points[:, :2] = points[:, :2] @ rot.T
    gt_boxes[:, :2] = gt_boxes[:, :2] @ rot.T
    gt_boxes[:, 6] += theta

    # global scale
    scale = rng.uniform(*cfg.scale_range)
    points[:, :3] *= scale
    gt_boxes[:, :6] *= scale

    # global translation
    t = rng.normal(0.0, cfg.translate_std, 3).astype(np.float32)
    points[:, :3] += t
    gt_boxes[:, :3] += t

    # keep yaw in [-pi, pi)
    gt_boxes[:, 6] = (gt_boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
    return points, gt_boxes
