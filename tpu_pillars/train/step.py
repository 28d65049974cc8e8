"""The jitted training step (SURVEY.md 3.2, rebuilt TPU-first): pillarize,
target-assign, forward, loss, backward, optimizer update — ALL inside one XLA
program. The reference does pillarization + IoU matching on host DataLoader
workers (its dominant wall-clock cost); here they are device ops fused into
the step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from tpu_pillars.config import PillarsConfig
from tpu_pillars.models.pointpillars import PointPillars, remat_flags
from tpu_pillars.ops.emit_pallas import pillarize_batch_auto
from tpu_pillars.ops.losses import LossBreakdown, detection_loss_fm
from tpu_pillars.ops.target_assigner import make_classwise_assigner
from tpu_pillars.ops.voxelize import PillarBatch
from tpu_pillars.train.state import TrainState


class TrainBatch(NamedTuple):
    """One data-parallel micro-batch, statically padded.

    points: (B, M, F) float32; num_points: (B,) int32;
    gt_boxes: (B, G, 7); gt_classes: (B, G) int32; gt_valid: (B, G) bool.
    """

    points: jnp.ndarray
    num_points: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_classes: jnp.ndarray
    gt_valid: jnp.ndarray


def make_train_step(config: PillarsConfig, iou_chunk: int = 16384,
                    max_gt_per_class: int = 16,
                    compute_dtype=jnp.float32, remat: bool | str = True,
                    assigner: str = "auto",
                    fused_frontend: bool | None = None,
                    axis_name: str | None = None,
                    accum_steps: int = 1):
    """Returns step(state, batch) -> (state, LossBreakdown). Pure function of
    (state, batch): jit, or shard_map over a mesh for data parallelism.

    Target assignment runs class-blocked (ops.target_assigner
    make_classwise_assigner): sum_c A_c x G_c IoU pairs instead of the dense
    A x G — identical targets while no class exceeds `max_gt_per_class`
    boxes per sweep.

    compute_dtype=jnp.bfloat16 enables mixed-precision training: model
    activations (PFN matmul, RPN convs, head) run in bf16 on the native MXU
    path while parameters, optimizer state, BatchNorm statistics, targets
    and losses all stay float32 (the standard master-weights recipe — the
    head outputs are cast back to f32 before the focal/Smooth-L1 losses).

    remat=True/"all" (default) checkpoints the PFN and RPN blocks:
    activations are recomputed in the backward pass instead of saved,
    trading a few percent of step time for the memory that caps batch size
    (the (B, P, N, 64) PFN and (B, 400, 400, C) conv intermediates).
    "pfn" checkpoints only the PFN tier (the dominant tensor) and saves
    the RPN conv activations for a recompute-free conv backward; "rpn" is
    the complement; False disables both. Numerics are bit-identical
    across modes on CPU (tests pin it); on TPU, toggling the RPN tier
    changes XLA fusion boundaries and conv rounding at ~1e-5 relative
    (measured tiny-config: 'pfn' == 'off' and 'rpn' == 'all' bit-for-bit,
    the two groups differ in the step-1 fwd loss already).

    MEASURED (v5e full size, probe_remat_modes[2].py, same-process
    2026-08-20): selective remat does NOT beat "all". b8 is bracketed
    (A/B/A): pfn 307.3 vs all 264.3/218.5 — loses ~25% (the saved
    (B,P,N,C)-recompute is cheaper than the HBM pressure of keeping
    every conv activation). b4 is single-control (rpn 122.4 / pfn 132.3
    / all 124.1): pfn loses, rpn is within drift of all — read as a tie,
    not a win. An earlier single-run "pfn wins 127 vs 163" was a drifted
    control — another cross-process-drift cautionary tale. Default
    stays "all".

    fused_frontend: None = auto (TPU only) — run the TRAIN forward's
    pillarize + decorate + PFN as the decoration-free fused front end
    (ops.fused_pfn.pfn_train_from_table): masked-BN batch statistics from
    F x F sufficient statistics of the flat emit table, folded into the
    weights, one differentiable pass — the decorated (B, P, N, 9) and
    two-pass-BN (B, P, N, C) tensors never materialize in either fwd or
    bwd. Same algebra as the classic path, different rounding (losses
    agree to tolerance, tests pin it); the fused PFN runs f32 even under
    compute_dtype=bf16 (its matmul is one bf16 MXU pass anyway — the
    standard TPU f32 default).

    accum_steps > 1 enables gradient accumulation: the batch's leading axis
    is split into `accum_steps` equal microbatches, per-microbatch gradients
    are computed sequentially under one `lax.scan` (so only microbatch-sized
    activations are ever live — composes with remat to push effective batch
    far past the HBM ceiling) and averaged before ONE optimizer update.
    Standard accumulation semantics: BatchNorm batch moments are
    per-microbatch (as in every framework's accumulation mode), and the
    running-stats momentum applies once per microbatch. Requires
    batch_size % accum_steps == 0.

    axis_name: set when the step runs PER-SHARD under shard_map (see
    parallel.train_dp.make_shardmap_train_step). BN batch statistics are
    psum'ed over that mesh axis (sync-BN: the fused path reduces its
    sufficient statistics, the flax BNs reduce their moments), gradients
    are pmean'ed before the optimizer, and the loss summary is reduced to
    global-batch values — the step then computes the SAME update on every
    shard as the GSPMD global-view formulation. Leave None under plain
    jit/GSPMD."""
    remat_pfn, _ = remat_flags(remat)  # validates the knob up front too
    model = PointPillars(config, use_running_average=False,
                         dtype=compute_dtype, remat=remat,
                         axis_name=axis_name)
    if fused_frontend is None:
        fused_frontend = jax.default_backend() == "tpu"

    pillarize_b = partial(pillarize_batch_auto, config=config)
    # assigner: "auto" = the windowed Pallas kernel on TPU (49.3 vs
    # 72.9 ms at batch 4, measured r3), the dense class-blocked XLA path
    # elsewhere (the interpret-mode kernel is correct but slow on CPU);
    # "dense"/"windowed" force one.
    if assigner == "auto":
        assigner = "windowed" if jax.default_backend() == "tpu" else "dense"
    if assigner == "windowed":
        from tpu_pillars.ops.assign_pallas import make_windowed_assigner

        assign_b = make_windowed_assigner(
            config, max_gt_per_class=max_gt_per_class)
    else:
        assign_b = jax.vmap(make_classwise_assigner(
            config, max_gt_per_class=max_gt_per_class, iou_chunk=iou_chunk))

    def _loss_from_feat(feat, params, batch):
        # feature-major head + loss: the anchor axis stays on lanes from
        # the head matmuls through every loss term — no (A, k<=9)
        # anchor-major tensor and no 720k-anchor transpose exists in the
        # train graph, fwd or bwd (grad A/B vs the SSDHead + entry-
        # transpose formulation: 113.2 -> 108.4 ms b4, identical loss;
        # see models.head.feature_major_head)
        from tpu_pillars.models.head import feature_major_head

        cls_fm, box_fm, dir_fm = feature_major_head(
            params["head"], feat, config.num_classes,
            config.anchors_per_loc, dtype=compute_dtype)
        targets = assign_b(batch.gt_boxes, batch.gt_classes, batch.gt_valid)
        losses = jax.vmap(
            lambda c, b, d, t: detection_loss_fm(c, b, d, t, config)
        )(cls_fm, box_fm, dir_fm, targets)
        total = jnp.mean(losses.total)
        summary = LossBreakdown(
            total=total,
            cls=jnp.mean(losses.cls),
            loc=jnp.mean(losses.loc),
            dir=jnp.mean(losses.dir),
            num_pos=jnp.sum(losses.num_pos),
        )
        return total, summary

    def loss_fn(params, batch_stats, pb: PillarBatch, batch: TrainBatch):
        feat, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, pb,
            method=PointPillars.features_from_batch,
            mutable=["batch_stats"],
        )
        total, summary = _loss_from_feat(feat, params, batch)
        return total, (summary, mutated["batch_stats"])

    def loss_fn_fused(params, batch_stats, table, meta, batch: TrainBatch):
        from tpu_pillars.ops.bev_pallas import scatter_to_bev_train_auto
        from tpu_pillars.ops.fused_pfn import pfn_train_from_table

        p = params["pfn"]

        def pfn_feats(w, scale, bias):
            return pfn_train_from_table(table, meta, w, scale, bias, config,
                                        axis_name=axis_name)

        # remat: the (rows, N, C) pre-max activation is the fused path's
        # only big intermediate — recompute it in the backward pass
        fn = jax.checkpoint(pfn_feats) if remat_pfn else pfn_feats
        feats, pid, cnt, b_mean, b_var = fn(
            p["linear"]["kernel"], p["bn"]["scale"], p["bn"]["bias"])
        P = config.max_pillars
        feats, pid, cnt = feats[:, :P], pid[:, :P], cnt[:, :P]
        # differentiable ring scatter on TPU (fwd ~2x the XLA scatter; bwd
        # is one row gather), XLA scatter elsewhere. The ring kernel emits
        # an f32 canvas even under bf16 compute (exact superset; the first
        # conv casts to compute_dtype anyway).
        canvas = scatter_to_bev_train_auto(
            feats.astype(compute_dtype), pid, cnt > 0.0, config)
        feat, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, canvas,
            method=PointPillars.features_from_canvas,
            mutable=["batch_stats"],
        )
        # the pfn module never ran — its running stats are this path's job
        # (same momentum/eps as models.pfn.MaskedBatchNorm defaults)
        mom = 0.99
        old = batch_stats["pfn"]["bn"]
        new_stats = dict(mutated["batch_stats"])
        new_stats["pfn"] = {"bn": {
            "mean": mom * old["mean"] + (1.0 - mom) * b_mean,
            "var": mom * old["var"] + (1.0 - mom) * b_var,
        }}
        total, summary = _loss_from_feat(feat, params, batch)
        return total, (summary, new_stats)

    def grads_of(params, batch_stats, batch: TrainBatch):
        """(losses, new_stats, grads) for one (micro)batch."""
        if fused_frontend:
            from tpu_pillars.ops.fused_pfn import emit_centered_table

            table, meta = emit_centered_table(batch.points,
                                              batch.num_points, config)
            grad_fn = jax.value_and_grad(loss_fn_fused, has_aux=True)
            (_, (losses, new_stats)), grads = grad_fn(
                params, batch_stats, table, meta, batch
            )
        else:
            pb = pillarize_b(batch.points, batch.num_points)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (losses, new_stats)), grads = grad_fn(
                params, batch_stats, pb, batch
            )
        return losses, new_stats, grads

    def train_step(state: TrainState, batch: TrainBatch
                   ) -> Tuple[TrainState, LossBreakdown]:
        if accum_steps == 1:
            losses, new_stats, grads = grads_of(
                state.params, state.batch_stats, batch)
        else:
            B = batch.points.shape[0]
            assert B % accum_steps == 0, (
                f"batch {B} not divisible by accum_steps {accum_steps}")
            micro = jax.tree.map(
                lambda x: x.reshape(accum_steps, B // accum_steps,
                                    *x.shape[1:]), batch)

            def body(carry, mbatch):
                stats, gacc, lacc = carry
                losses, stats, grads = grads_of(state.params, stats, mbatch)
                gacc = jax.tree.map(jnp.add, gacc, grads)
                lacc = jax.tree.map(jnp.add, lacc, losses)
                return (stats, gacc, lacc), None

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            zero_l = LossBreakdown(*([jnp.zeros(())] * 5))
            (new_stats, gsum, lsum), _ = jax.lax.scan(
                body, (state.batch_stats, zero_g, zero_l), micro)
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, gsum)
            losses = LossBreakdown(          # means of per-micro means,
                total=lsum.total * inv,      # which ARE the batch means
                cls=lsum.cls * inv,          # (equal-sized microbatches);
                loc=lsum.loc * inv,          # num_pos stays a batch sum
                dir=lsum.dir * inv,
                num_pos=lsum.num_pos,
            )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            losses = LossBreakdown(
                total=jax.lax.pmean(losses.total, axis_name),
                cls=jax.lax.pmean(losses.cls, axis_name),
                loc=jax.lax.pmean(losses.loc, axis_name),
                dir=jax.lax.pmean(losses.dir, axis_name),
                num_pos=jax.lax.psum(losses.num_pos, axis_name),
            )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        ), losses

    return train_step


def make_eval_forward(config: PillarsConfig):
    """Batched forward with frozen BN for validation loss / detection eval."""
    model = PointPillars(config, use_running_average=True)

    def forward(variables, points, num_points):
        pb = pillarize_batch_auto(points, num_points, config)
        return model.apply(variables, pb)

    return forward
