"""Test-time augmentation (TTA): predict under BEV flips, map detections
back, merge with class-aware NMS.

The SECOND/PointPillars competition lineage (SURVEY.md:31 [K]) standardly
ensembles flipped views for leaderboard runs; this is the TPU-native
version: each view is one extra pass through the already-compiled jitted
pipeline (same static shapes — no recompile per view), the merge runs on
the tiny (n_views * D, 7) union.

Flips are EXACT float transforms (negation), so view "none" reproduces the
plain detector bit-for-bit and a y-flipped scene under the {none, y} view
set yields the mirror-image detection set exactly (tests pin both).

Merging: union of per-view detections -> descending score -> class-aware
rotated NMS (the same class-shift trick as ops.postprocess._nms_and_pack)
-> top max_detections. Score order ties break toward the earlier view in
`modes` order (stable sort), so results are deterministic.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax.numpy as jnp

from tpu_pillars.config import PillarsConfig
from tpu_pillars.geometry.boxes import Box3D
from tpu_pillars.ops.nms import rotated_nms

MODES = ("none", "y", "x", "xy")


def flip_points(points: np.ndarray, mode: str) -> np.ndarray:
    """points (N, >=3) -> flipped copy. 'y' mirrors across the x axis
    (y -> -y, as data.augment's training flip), 'x' across the y axis,
    'xy' both (a 180-degree rotation)."""
    if mode not in MODES:
        raise ValueError(f"unknown TTA mode {mode!r}; expected one of {MODES}")
    out = np.array(points, dtype=np.float32, copy=True)
    if "y" in mode:
        out[:, 1] = -out[:, 1]
    if "x" in mode:
        out[:, 0] = -out[:, 0]
    return out


def unflip_boxes(boxes: np.ndarray, mode: str) -> np.ndarray:
    """Inverse-map (n, 7) boxes detected in a flipped view back to the
    original frame. Center flips mirror flip_points; yaw: y-flip negates,
    x-flip reflects (pi - yaw); both compose to yaw + pi."""
    out = np.array(boxes, dtype=np.float32, copy=True)
    yaw = out[:, 6].copy()
    if "y" in mode:
        out[:, 1] = -out[:, 1]
        yaw = -yaw
    if "x" in mode:
        out[:, 0] = -out[:, 0]
        yaw = np.pi - yaw
    out[:, 6] = (yaw + np.pi) % (2 * np.pi) - np.pi
    return out


def merge_packed(union: np.ndarray, cfg: PillarsConfig) -> np.ndarray:
    """Merge a (n, 10) union of packed detections (already in the original
    frame): stable score-descending sort -> class-aware rotated NMS (the
    class-shift trick) -> top max_detections. Returns (m, 10)."""
    if not len(union):
        return union.reshape(0, 10)
    order = np.argsort(-union[:, 7], kind="stable")
    union = union[order]
    span = (cfg.x_max - cfg.x_min) + (cfg.y_max - cfg.y_min)
    shifted = union[:, :7].copy()
    shifted[:, 0] += union[:, 8] * 4.0 * span
    keep = np.asarray(rotated_nms(
        jnp.asarray(shifted), jnp.asarray(union[:, 7]),
        jnp.ones((len(union),), bool), cfg.nms_iou_threshold))
    return union[keep][: cfg.max_detections]


def tta_union(packed_by_mode, modes: Sequence[str]) -> np.ndarray:
    """Per-mode packed outputs [(D, 10) host arrays] -> unflipped union of
    their valid rows, in `modes` order (ties in the merge then break
    toward the earlier view)."""
    packs = []
    for packed, mode in zip(packed_by_mode, modes):
        p = np.asarray(packed)
        p = p[p[:, 9] > 0.5]
        if len(p):
            p[:, :7] = unflip_boxes(p[:, :7], mode)
            packs.append(p)
    if not packs:
        return np.zeros((0, 10), np.float32)
    return np.concatenate(packs, axis=0)


def predict_tta(det, points: np.ndarray,
                modes: Sequence[str] = MODES,
                token: str = "") -> List[Box3D]:
    """Flip-ensembled detections for one sweep.

    det: a Detector; points (N, F) host cloud. Each mode runs the standard
    jitted pipeline on the flipped cloud (identical static shapes), boxes
    are mapped back, and the union is merged by class-aware NMS at the
    config's nms_iou_threshold. modes=("none",) degrades to exactly
    det.predict.
    """
    cfg: PillarsConfig = det.config
    packed_by_mode = [det.predict_packed(flip_points(points, mode))
                      for mode in modes]
    merged = merge_packed(tta_union(packed_by_mode, modes), cfg)
    names = cfg.class_names
    return [
        Box3D.from_array(row[:7], label=names[int(row[8])],
                         score=float(row[7]), token=token)
        for row in merged
    ]
