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
    """All inputs (A, ·) for one sweep; see models.ModelOutputs."""
    norm = jnp.maximum(targets.num_pos, 1.0)

    cls_el = sigmoid_focal_loss(
        cls_logits, targets.cls_onehot, config.focal_alpha, config.focal_gamma
    )
    cls_loss = jnp.sum(cls_el * targets.cls_weights[:, None]) / norm

    # sin-encoded angle residual: replaces (tp - tt) with sin(tp - tt),
    # making theta and theta+pi equivalent for localization (dir head
    # disambiguates) [PointPillars paper section 2.3]
    diff = box_deltas - targets.reg_targets
    angle = jnp.sin(box_deltas[:, 6] - targets.reg_targets[:, 6])
    diff = jnp.concatenate([diff[:, :6], angle[:, None]], axis=1)
    loc_el = smooth_l1(diff)
    loc_loss = jnp.sum(loc_el * targets.reg_weights[:, None]) / norm

    logp = jax.nn.log_softmax(dir_logits, axis=-1)
    dir_el = -jnp.take_along_axis(logp, targets.dir_targets[:, None], axis=1)[:, 0]
    dir_loss = jnp.sum(dir_el * targets.reg_weights) / norm

    total = (config.pos_weight_cls * cls_loss
             + config.weight_loc * loc_loss
             + config.weight_dir * dir_loss)
    return LossBreakdown(total, cls_loss, loc_loss, dir_loss, targets.num_pos)
