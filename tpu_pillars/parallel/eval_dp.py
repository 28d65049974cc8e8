"""Data-parallel evaluation (BASELINE.json config #5: 'data-parallel eval
over Lyft val on a v5e-8 mesh: sharded sweeps, gathered mAP').

Explicit shard_map formulation: each device runs the full points->boxes
detector on its shard of sweeps, then detections ride one `all_gather` over
ICI back to every device; the host reads a single replicated array. The mAP
protocol itself (IoU-threshold sweep, greedy matching) is host-side NumPy in
evaluation.map_eval — it is O(preds x gts), not a TPU-shaped workload.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpu_pillars.config import PillarsConfig
from tpu_pillars.detector import build_forward_fn
from tpu_pillars.ops.postprocess import Detections


def make_dp_packed_detector(config: PillarsConfig, mesh: Mesh,
                            axis_name: str = "data"):
    """Returns f(variables, points (B, M, F), num_points (B,)) -> packed
    detections (B, D, 10), replicated. B must divide by the mesh size.

    Structured as TWO jitted shard_map programs with a device-resident
    hand-off — the same two-executable split Detector uses on a single chip
    (monolithic model+postprocess jit explodes compile time and inherits
    conv-tiled layouts in the anchor gathers; see detector.build_forward_fn).
    Stage 1 runs the natively-batched model on each device's local shard of
    sweeps (ONE sort + ONE conv batch per device, not vmap); stage 2 decodes
    + NMS + packs, then one tiled `all_gather` over ICI returns every
    device's detections to all of them. This is BASELINE config #5's
    'sharded sweeps' half; evaluation.pipeline.evaluate_dataset supplies the
    'gathered mAP' half on the host.
    """
    from tpu_pillars.detector import (
        build_model_fn_batched, build_postprocess_fn, pack_detections,
    )

    model_b = build_model_fn_batched(config)
    post_fn = build_postprocess_fn(config)
    post_packed_b = jax.vmap(
        lambda c, b, d: pack_detections(post_fn(c, b, d)))

    stage1 = jax.jit(shard_map(
        model_b, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        # the Pallas PFN kernel's out_shape carries no vma annotation;
        # outputs are plainly batch-sharded, checker can't see through it
        check_vma=False,
    ))

    def stage2_local(cls_logits, box_deltas, dir_logits):
        packed = post_packed_b(cls_logits, box_deltas, dir_logits)
        return jax.lax.all_gather(packed, axis_name, axis=0, tiled=True)

    stage2 = jax.jit(shard_map(
        stage2_local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        # output IS replicated (tiled all_gather); vma can't infer it
        check_vma=False,
    ))

    def predict_packed_batch(variables, points, num_points):
        return stage2(*stage1(variables, points, num_points))

    return predict_packed_batch


def make_dp_detector_fn(config: PillarsConfig, mesh: Mesh,
                        axis_name: str = "data"):
    """Returns f(variables, points (B, M, F), num_points (B,)) -> Detections
    with leading dim B (global), where B must divide by mesh size. Each
    device detects its B/n_dev sweeps; results are all_gathered."""
    forward = build_forward_fn(config)
    batched = jax.vmap(forward, in_axes=(None, 0, 0))

    def local_shard(variables, points, num_points) -> Detections:
        det = batched(variables, points, num_points)
        # gather every shard's detections to all devices (tiled: concat on
        # the sweep axis) — one ICI all_gather, no per-sweep host traffic
        return jax.tree.map(
            partial(jax.lax.all_gather, axis_name=axis_name, axis=0,
                    tiled=True),
            det,
        )

    sharded = shard_map(
        local_shard, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        # outputs ARE replicated (tiled all_gather) but the static vma
        # checker cannot infer it through the gathered pytree
        check_vma=False,
    )
    return jax.jit(sharded)
