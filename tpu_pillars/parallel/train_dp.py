"""Data-parallel training over a TPU mesh, GSPMD-style: the SAME pure
train_step is jitted with sharding annotations — batch split on the 'data'
axis, state replicated — and XLA inserts the gradient all-reduce over ICI
(SURVEY.md section 2: DP is 'first-class' in the rebuild; no NCCL/MPI layer,
no hand-written comm).
"""

from __future__ import annotations

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_pillars.config import PillarsConfig
from tpu_pillars.train.step import TrainBatch, make_train_step


def make_dp_train_step(config: PillarsConfig, mesh: Mesh,
                       axis_name: str = "data", iou_chunk: int = 8192,
                       **step_kw):
    """Returns a jitted step(state, batch) with global-batch semantics:
    per-shard forward/backward, XLA-inserted grad psum, replicated update.
    Extra kwargs (compute_dtype, remat, fused_frontend, ...) pass through
    to make_train_step."""
    step = make_train_step(config, iou_chunk=iou_chunk, **step_kw)
    replicated = NamedSharding(mesh, P())
    batch_sharded = TrainBatch(
        points=NamedSharding(mesh, P(axis_name)),
        num_points=NamedSharding(mesh, P(axis_name)),
        gt_boxes=NamedSharding(mesh, P(axis_name)),
        gt_classes=NamedSharding(mesh, P(axis_name)),
        gt_valid=NamedSharding(mesh, P(axis_name)),
    )
    return jax.jit(
        step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
    )


def make_shardmap_train_step(config: PillarsConfig, mesh: Mesh,
                             axis_name: str = "data", iou_chunk: int = 8192,
                             **step_kw):
    """Explicit-collectives twin of :func:`make_dp_train_step`: the step runs
    PER-SHARD under shard_map — each device pillarizes, assigns, and
    differentiates its local batch slice, BN batch statistics ride a psum
    (sync-BN; the fused front end reduces its F x F sufficient statistics,
    the flax BNs their moments), and gradients are pmean'ed before a
    replicated optimizer update (train/step.py axis_name plumbing).

    Same global-batch semantics as the GSPMD version to float tolerance.
    Prefer THIS formulation on real multi-chip meshes: the per-shard local
    view hands the Pallas kernels (emit pillarizer, windowed assigner)
    their device-local batch directly, instead of relying on the SPMD
    partitioner to split a custom call it cannot see into.

    Returns a jitted step(state, sharded_batch) -> (state, LossBreakdown);
    shard the batch with :func:`shard_train_batch`."""
    step = make_train_step(config, iou_chunk=iou_chunk, axis_name=axis_name,
                           **step_kw)
    batch_specs = TrainBatch(*([P(axis_name)] * 5))
    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=(P(), P()),
        # outputs ARE replicated (post-pmean update on every shard) but the
        # static vma checker cannot see that through the optimizer pytree
        check_vma=False,
    ))


def shard_train_batch(batch: TrainBatch, mesh: Mesh,
                      axis_name: str = "data") -> TrainBatch:
    """Place a host-global batch onto the mesh, split along the batch dim."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
