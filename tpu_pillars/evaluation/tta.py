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

Accuracy evidence (scripts/probe_tta_gain.py, 2026-08-20, 16 held-out
synthetic scenes, full-size trained checkpoints):
  1500-step ckpt: plain 0.3355 / TTA+NMS 0.3138 / TTA+WBF 0.3615 (+2.6)
  4000-step ckpt: plain 0.5297 / TTA+NMS 0.5060 / TTA+WBF 0.5717 (+4.2)
The NMS merge LOSES on both — suppressing a view's detection by a
slightly-offset twin discards the averaging benefit and keeps
single-view localization noise; WBF gains consistently. The evaluation
surfaces (evaluate_dataset, the CLI) therefore default to merge="wbf";
predict_tta keeps the NMS merge as its default (cheaper, and it is the
only merge that guarantees the no-same-class-overlap invariant).
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


def merge_packed(union: np.ndarray, cfg: PillarsConfig,
                 method: str = "nms", num_views: int = 1) -> np.ndarray:
    """Merge a (n, 10) union of packed detections (already in the original
    frame). Returns (m, 10), score-descending.

    method="nms": stable score-descending sort -> class-aware rotated NMS
    (the class-shift trick) -> top max_detections. The winner of each
    overlap group survives verbatim.

    method="wbf": weighted box fusion (Solovyev et al. 2019, adapted to
    rotated BEV): overlapping same-class boxes are FUSED — center and size
    are score-weighted means, yaw a score-weighted circular mean (members
    more than pi/2 from the cluster seed are flipped by pi first: the
    direction ambiguity), and the fused score is the members' mean scaled
    by min(n_members, num_views)/num_views, down-weighting boxes only a
    minority of views found. Standard competition-ensemble merge; pass
    num_views = number of TTA views.
    """
    if not len(union):
        return union.reshape(0, 10)
    order = np.argsort(-union[:, 7], kind="stable")
    union = union[order]
    if method == "nms":
        span = (cfg.x_max - cfg.x_min) + (cfg.y_max - cfg.y_min)
        shifted = union[:, :7].copy()
        shifted[:, 0] += union[:, 8] * 4.0 * span
        keep = np.asarray(rotated_nms(
            jnp.asarray(shifted), jnp.asarray(union[:, 7]),
            jnp.ones((len(union),), bool), cfg.nms_iou_threshold))
        return union[keep][: cfg.max_detections]
    if method != "wbf":
        raise ValueError(f"unknown merge method {method!r}; "
                         f"expected 'nms' or 'wbf'")

    from tpu_pillars.reference_cpu.postprocess import rotated_iou_bev_np

    thr = cfg.nms_iou_threshold
    fused_rows: list = []        # running fused (10,) per cluster
    members: list = []           # list of (n_i, 10) arrays per cluster
    for row in union:
        hit = -1
        if fused_rows:
            fb = np.stack(fused_rows)
            same = fb[:, 8] == row[8]
            if same.any():
                iou = rotated_iou_bev_np(row[None, :7], fb[same, :7])[0]
                local = np.nonzero(iou > thr)[0]
                if len(local):
                    hit = np.nonzero(same)[0][local[0]]
        if hit < 0:
            members.append([row])
            fused_rows.append(row.copy())
            continue
        members[hit].append(row)
        mem = np.stack(members[hit])
        w = mem[:, 7] / mem[:, 7].sum()
        fused = fused_rows[hit]
        fused[:6] = w @ mem[:, :6]
        # circular yaw mean with pi-flip alignment to the cluster seed
        seed = members[hit][0][6]
        d = ((mem[:, 6] - seed + np.pi) % (2 * np.pi)) - np.pi
        d = np.where(np.abs(d) > np.pi / 2,          # direction ambiguity:
                     ((d + 2 * np.pi) % (2 * np.pi)) - np.pi, d)
        fused[6] = (seed + np.arctan2(w @ np.sin(d), w @ np.cos(d))
                    + np.pi) % (2 * np.pi) - np.pi
    out = np.stack(fused_rows)
    # score credit for EVERY cluster (incl. singletons): members' mean,
    # scaled down when only a minority of views contributed
    for i, mem_list in enumerate(members):
        scores = np.asarray([m[7] for m in mem_list])
        out[i, 7] = (scores.mean()
                     * min(len(mem_list), num_views) / num_views)
    out = out[np.argsort(-out[:, 7], kind="stable")]
    return out[: cfg.max_detections]


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
                token: str = "", merge: str = "nms") -> List[Box3D]:
    """Flip-ensembled detections for one sweep.

    det: a Detector; points (N, F) host cloud. Each mode runs the standard
    jitted pipeline on the flipped cloud (identical static shapes), boxes
    are mapped back, and the union is merged (`merge`: "nms" or "wbf", see
    merge_packed) at the config's nms_iou_threshold. modes=("none",) with
    the default merge degrades to exactly det.predict.
    """
    cfg: PillarsConfig = det.config
    packed_by_mode = [det.predict_packed(flip_points(points, mode))
                      for mode in modes]
    merged = merge_packed(tta_union(packed_by_mode, modes), cfg,
                          method=merge, num_views=len(modes))
    names = cfg.class_names
    return [
        Box3D.from_array(row[:7], label=names[int(row[8])],
                         score=float(row[7]), token=token)
        for row in merged
    ]
