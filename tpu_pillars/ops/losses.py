"""Detection losses (SURVEY.md section 2 'Losses'; PointPillars paper
section 2.3): sigmoid focal loss (alpha=0.25, gamma=2) for classification,
smooth-L1 on 7-D residuals with the sin(theta_p - theta_t) angle term, and
2-way direction cross-entropy. Loss weights: beta_loc=2, beta_cls=1,
beta_dir=0.2; all normalized by the positive-anchor count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_pillars.config import PillarsConfig
from tpu_pillars.ops.target_assigner import Targets


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    cls: jnp.ndarray
    loc: jnp.ndarray
    dir: jnp.ndarray
    num_pos: jnp.ndarray


def sigmoid_focal_loss(logits, targets, alpha: float, gamma: float):
    """Elementwise focal loss. logits, targets: (..., K)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return alpha_t * (1.0 - p_t) ** gamma * ce


def smooth_l1(x, beta: float = 1.0 / 9.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def detection_loss(cls_logits, box_deltas, dir_logits, targets: Targets,
                   config: PillarsConfig) -> LossBreakdown:
    """All inputs (A, ·) for one sweep; see models.ModelOutputs.

    Internally everything runs feature-major — (k, A) with the 720k-anchor
    axis on TPU lanes (this wrapper transposes at entry and forwards to
    detection_loss_fm; prefer that + models.head.feature_major_head in
    training hot paths, where the vmapped 720k-anchor transposes are a
    real relayout paid in BOTH fwd and bwd). Anchor-major (A, k)
    intermediates tile to (8, 128) vregs with 9, 7 or 2 live lanes (14-64x
    padding in VPU work and HBM traffic); on v5e going feature-major cut
    the loss from ~13 to ~2 ms per batch-4 step. The 2-way direction CE
    is a select, not a take_along_axis (a 720k-element gather costs ~45
    cycles/element on TPU)."""
    return detection_loss_fm(cls_logits.T, box_deltas.T, dir_logits.T,
                             targets, config)


def detection_loss_fm(cls_fm, box_fm, dir_fm, targets: Targets,
                      config: PillarsConfig) -> LossBreakdown:
    """detection_loss with FEATURE-MAJOR inputs — cls (K, A), box (7, A),
    dir (2, A) — exactly the layout models.head.feature_major_head emits
    and Targets already carries; no transpose exists anywhere in the
    loss graph (fwd or bwd)."""
    norm = jnp.maximum(targets.num_pos, 1.0)

    cls_el = sigmoid_focal_loss(
        cls_fm, targets.cls_onehot,
        config.focal_alpha, config.focal_gamma
    )                                                    # (9, A)
    cls_loss = jnp.sum(cls_el * targets.cls_weights[None, :]) / norm

    # sin-encoded angle residual: replaces (tp - tt) with sin(tp - tt),
    # making theta and theta+pi equivalent for localization (dir head
    # disambiguates) [PointPillars paper section 2.3]
    box_t = box_fm                                       # (7, A)
    reg_t = targets.reg_targets
    diff = box_t - reg_t
    angle = jnp.sin(box_t[6] - reg_t[6])
    diff = jnp.concatenate([diff[:6], angle[None, :]], axis=0)
    loc_el = smooth_l1(diff)
    loc_loss = jnp.sum(loc_el * targets.reg_weights[None, :]) / norm

    logp = jax.nn.log_softmax(dir_fm, axis=0)            # (2, A)
    dir_el = -jnp.where(targets.dir_targets == 1, logp[1], logp[0])
    dir_loss = jnp.sum(dir_el * targets.reg_weights) / norm

    total = (config.pos_weight_cls * cls_loss
             + config.weight_loc * loc_loss
             + config.weight_dir * dir_loss)
    return LossBreakdown(total, cls_loss, loc_loss, dir_loss, targets.num_pos)
