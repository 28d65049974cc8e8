"""Pillar-axis (spatial) sharding of the detector front end.

SURVEY.md §5 'long-context analog' row: this workload's scale axis is the
point/pillar count, and the prescribed mechanism when ONE cloud's pillar
budget exceeds a single chip's comfort is to shard the PILLAR axis over the
mesh ("pillar axis shardable across mesh if a budget exceeds one chip's
HBM comfort"; §2 parallelism table: "optional sharding of the pillar axis
across devices for the multi-sweep (large-cloud) config #4"). Data
parallelism (parallel.eval_dp / train_dp) scales over SWEEPS; this module
scales over ONE sweep's spatial extent.

Design (TPU-first): each device owns a contiguous band of BEV rows. The
host splits the cloud by row band (split_points_by_slab — order-preserving,
so the canonical within-pillar tie-break rule 4 of ops/voxelize.py is
untouched). Each device pillarizes only its own points under its own
max_pillars budget, runs the PFN, and scatters into a full-size (H, W, C)
canvas; ONE `psum` over ICI sums the per-device canvases. Because a pillar
cell lives in exactly one row band, the per-device canvases have disjoint
support — the psum adds real features only to zeros, which is EXACT in f32,
so with no budget overflow the result is bit-identical to the single-device
front end (tests pin this on the 8-device CPU mesh).

Budget semantics under overflow: the pillar cap is per-band (global
capacity = n_devices x config.max_pillars, kept in ascending-pillar-id
order within each band) — strictly more capacity than one chip, which is
the point. A cloud that overflows a single chip's budget can be sharded
losslessly as long as no single band overflows.

The conv model is intentionally NOT spatially sharded: at 400x400x64 the
canvas is ~41 MB — the HBM pressure lives in the front end's point/pillar
tables, not the RPN. make_spatial_detector_fn runs the model+head
replicated after the psum (every device computes the same convs; the
detections come back identical on all devices), reusing the two-executable
stage split that detector.Detector uses on one chip.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpu_pillars.config import PillarsConfig


def split_points_by_slab(
    points: np.ndarray,
    config: PillarsConfig,
    n_shards: int,
    capacity: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Host-side splitter: one cloud -> per-shard padded clouds by BEV row
    band.

    points: (M, F) float32 (F = num_input_features). Rows are binned
    exactly as ops/voxelize.py rule 2 (floor((y - y_min) / voxel_y));
    shard k owns rows [k*H/n, (k+1)*H/n). Out-of-range points (rule 1's
    range crop, including the z gate) are dropped here — the device path
    would drop them anyway, and shipping them to an arbitrary shard would
    only waste upload bytes. Input order is preserved within each shard,
    so per-pillar point order (tie-break rule 4) matches the unsharded
    pillarizer bit-for-bit.

    Returns (shard_points (n, capacity, F) f32, counts (n,) int32, info)
    where info = {"dropped_range": int, "dropped_capacity": int}.
    Capacity defaults to config.max_points (same per-shard budget as a
    single chip — splitting never truncates harder than one device would).
    """
    points = np.asarray(points, np.float32)
    if points.ndim != 2:
        raise ValueError(f"points must be (M, F), got {points.shape}")
    H, W = config.grid_h, config.grid_w
    if H % n_shards != 0:
        raise ValueError(f"grid_h={H} not divisible by n_shards={n_shards}")
    band = H // n_shards
    capacity = config.max_points if capacity is None else int(capacity)

    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    col = np.floor((x - config.x_min) / config.voxel_x).astype(np.int64)
    row = np.floor((y - config.y_min) / config.voxel_y).astype(np.int64)
    in_range = (
        (col >= 0) & (col < W) & (row >= 0) & (row < H)
        & (z >= config.z_min) & (z <= config.z_max)
    )
    kept = points[in_range]
    shard = row[in_range] // band

    out = np.zeros((n_shards, capacity, points.shape[1]), np.float32)
    counts = np.zeros((n_shards,), np.int32)
    dropped_capacity = 0
    for k in range(n_shards):
        mine = kept[shard == k]          # order-preserving boolean take
        n_k = min(len(mine), capacity)
        dropped_capacity += len(mine) - n_k
        out[k, :n_k] = mine[:n_k]
        counts[k] = n_k
    info = {
        "dropped_range": int(len(points) - len(kept)),
        "dropped_capacity": int(dropped_capacity),
    }
    return out, counts, info


def make_spatial_frontend(config: PillarsConfig, mesh: Mesh,
                          axis_name: str = "data",
                          use_pallas_pfn: bool = True,
                          fused_frontend: bool | None = None):
    """Returns jitted f(variables, points (n, M, F), num_points (n,)) ->
    BEV canvas (H, W, C), replicated over the mesh.

    `points` is the output of split_points_by_slab (leading axis = mesh
    axis). Each device builds the canvas of its row band with the same
    front end the single-chip detector uses (fused emit+PFN Pallas path on
    TPU, classic XLA path elsewhere — detector.build_canvas_fn); disjoint
    slab canvases are summed with one psum over ICI.
    """
    from tpu_pillars.detector import build_canvas_fn

    canvas_fn = build_canvas_fn(config, use_pallas_pfn=use_pallas_pfn,
                                fused_frontend=fused_frontend)

    def local_fn(variables, points, num_points):
        canvas = canvas_fn(variables, points[0], num_points[0])
        return jax.lax.psum(canvas, axis_name)

    return jax.jit(shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        # Pallas kernel outputs carry no vma annotation; the psum output
        # is plainly replicated but the static checker can't see through
        # the custom calls (same stance as parallel.eval_dp)
        check_vma=False,
    ))


def make_spatial_detector_fn(config: PillarsConfig, mesh: Mesh,
                             axis_name: str = "data",
                             dtype=jnp.float32,
                             use_pallas_pfn: bool = True,
                             fused_frontend: bool | None = None,
                             nms_impl: str = "auto"):
    """Returns f(variables, points (n, M, F), num_points (n,)) -> packed
    detections (max_detections, 10), replicated — one giant cloud in,
    boxes out, with the front end sharded over the mesh's row bands.

    Two jitted executables with a device-resident hand-off (the same
    stage split Detector uses — a monolithic model+postprocess jit
    explodes compile time; see detector.build_forward_fn): stage 1 =
    sharded front end + psum + replicated RPN/head emitting wire tensors;
    stage 2 = decode + NMS + pack. Unpack to Box3D with
    detector.packed_to_boxes.
    """
    from tpu_pillars.detector import (
        _wire_head, build_canvas_fn, build_postprocess_fn, pack_detections,
    )
    from tpu_pillars.models.pointpillars import PointPillars

    canvas_fn = build_canvas_fn(config, dtype=dtype,
                                use_pallas_pfn=use_pallas_pfn,
                                fused_frontend=fused_frontend)
    model = PointPillars(config, dtype=dtype)
    wire_head = _wire_head(config, dtype=dtype)
    post_fn = build_postprocess_fn(config, nms_impl=nms_impl)

    def stage1_local(variables, points, num_points):
        canvas = jax.lax.psum(canvas_fn(variables, points[0], num_points[0]),
                              axis_name)
        feat = model.apply(variables, canvas,
                           method=PointPillars.features_from_canvas)
        return wire_head(variables["params"]["head"], feat)

    stage1 = jax.jit(shard_map(
        stage1_local, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    ))
    stage2 = jax.jit(lambda own, box_p, dir_p: pack_detections(
        post_fn(own, box_p, dir_p)))

    def predict_packed(variables, points, num_points):
        return stage2(*stage1(variables, points, num_points))

    return predict_packed
