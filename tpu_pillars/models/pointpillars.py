"""PointPillars detector module: PFN -> BEV scatter -> RPN -> SSD head
(SURVEY.md section 2 L2 'Model'; reference forward contract:
``forward(pillars, coords) -> (cls_logits, box_deltas, dir_logits)``).

The module operates on one sweep's static-shape PillarBatch; batching is done
with `jax.vmap` outside (XLA then batches the convs). Everything here is a
pure function of (params, batch) — jit/vmap/pjit compose freely.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from tpu_pillars.config import PillarsConfig
from tpu_pillars.models.backbone import RPNBackbone
from tpu_pillars.models.head import SSDHead, HeadOutputs
from tpu_pillars.models.pfn import PillarFeatureNet
from tpu_pillars.ops.voxelize import PillarBatch, scatter_to_bev


class ModelOutputs(NamedTuple):
    cls_logits: jnp.ndarray   # (..., A, num_classes)
    box_deltas: jnp.ndarray   # (..., A, 7)
    dir_logits: jnp.ndarray   # (..., A, 2)


def remat_flags(remat) -> tuple[bool, bool]:
    """Normalize the remat knob to (checkpoint_pfn, checkpoint_rpn).

    True/"all" checkpoints both tiers (the r3 default: required for the
    batch-8 full-size compile). "pfn" checkpoints only the PFN — its
    (B, P, N, C) activation is the dominant training tensor (~2.4 GB at
    batch-8 full size) while the RPN's conv activations are saved for a
    recompute-free backward. "rpn" is the complement; False disables both.
    Remat re-executes the same ops, so numerics are bit-identical across
    modes on CPU; on TPU, toggling the RPN tier shifts XLA fusion
    boundaries and rounds convs differently (~1e-5 relative).

    Measured (v5e, scripts/probe_remat_modes2.py 2026-08-20): neither
    selective mode beats "all" — see make_train_step's docstring for the
    numbers. "all" stays the default."""
    if remat is None or remat == "off" or remat == False:  # noqa: E712
        return False, False
    if remat == "pfn":
        return True, False
    if remat == "rpn":
        return False, True
    # equality (not identity) so np.bool_/0/1 round-tripped flags still work
    if remat == True or remat == "all":  # noqa: E712
        return True, True
    raise ValueError(f"remat must be bool, 'all', 'pfn', 'rpn' or 'off'; "
                     f"got {remat!r}")


class PointPillars(nn.Module):
    """Accepts an unbatched PillarBatch (P, N, D) or a batched one with a
    leading B dim on every field — the batched path keeps convs as one big
    NHWC call (best MXU utilization) and pools BN stats across the batch."""

    config: PillarsConfig
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    # remat=True/"all" checkpoints the PFN and every RPN block: the
    # (B, P, N, C) post-linear PFN activation and the (B, H, W, C) conv
    # activations are recomputed in the backward pass instead of saved —
    # the training memory lever (VERDICT r2 item 9). "pfn"/"rpn" checkpoint
    # one tier only (see remat_flags). Identical numerics, same param tree.
    remat: bool | str = False
    # psum BN batch statistics over this mesh axis when training under
    # shard_map (sync-BN; see parallel.train_dp.make_shardmap_train_step)
    axis_name: str | None = None

    def setup(self):
        cfg = self.config
        remat_pfn, remat_rpn = remat_flags(self.remat)
        pfn_cls = nn.remat(PillarFeatureNet) if remat_pfn \
            else PillarFeatureNet
        self.pfn = pfn_cls(
            channels=cfg.pfn_channels,
            use_running_average=self.use_running_average,
            dtype=self.dtype, axis_name=self.axis_name,
        )
        self.rpn = RPNBackbone(
            channels=cfg.rpn_channels, layers=cfg.rpn_layers,
            up_channels=cfg.rpn_up_channels,
            use_running_average=self.use_running_average,
            dtype=self.dtype, remat=remat_rpn, axis_name=self.axis_name,
        )
        self.head = SSDHead(
            num_classes=cfg.num_classes,
            anchors_per_loc=cfg.anchors_per_loc,
            dtype=self.dtype,
        )

    def __call__(self, batch: PillarBatch) -> ModelOutputs:
        return self.detect_from_canvas(self.canvas_from_batch(batch))

    def canvas_from_batch(self, batch: PillarBatch):
        """PFN + BEV scatter only: (P, N, D) pillars -> (H, W, C) canvas."""
        pillar_feats = self.pfn(batch.features, batch.mask)
        return scatter_to_bev(pillar_feats, batch.coords,
                              batch.pillar_mask, self.config)

    def detect_from_canvas(self, canvas) -> ModelOutputs:
        """RPN + head only — entry point for the fused Pallas PFN path,
        which computes pillar features and the canvas outside flax."""
        out: HeadOutputs = self.head(self.rpn(canvas))
        return ModelOutputs(*out)

    def features_from_canvas(self, canvas):
        """RPN only: (..., H, W, C_in) canvas -> (..., H/2, W/2, C_feat)
        feature map. Serving entry point — the detector computes the head
        as explicit matmuls on the transposed feature map (the feature-
        major wire; see detector._wire_head) instead of self.head. The
        train step does the same with the canonical-order feature-major
        head (models.head.feature_major_head)."""
        return self.rpn(canvas)

    def features_from_batch(self, batch: PillarBatch):
        """PFN + scatter + RPN: pillars -> (..., H/2, W/2, C_feat) feature
        map — the classic-front-end training twin of features_from_canvas
        (the head runs outside flax as feature_major_head)."""
        return self.rpn(self.canvas_from_batch(batch))
