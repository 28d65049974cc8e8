"""SSD detection head: 1x1 convs over the BEV feature map
(SURVEY.md section 2 'SSD detection head'; PointPillars paper section 2.3).

Per feature-map location there are `anchors_per_loc` anchors (9 Lyft classes
x 2 yaws). Each anchor predicts `num_classes` class logits, a 7-D box
residual, and a 2-way direction logit (resolves yaw vs yaw+pi). Outputs are
reshaped to flat per-anchor tensors in the anchor-grid layout pinned by
ops.anchors (row, col, class*yaw).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax.numpy as jnp


class HeadOutputs(NamedTuple):
    cls_logits: jnp.ndarray   # (A, num_classes)
    box_deltas: jnp.ndarray   # (A, 7)
    dir_logits: jnp.ndarray   # (A, 2)


class SSDHead(nn.Module):
    num_classes: int
    anchors_per_loc: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> HeadOutputs:
        H, W = x.shape[-3], x.shape[-2]
        lead = x.shape[:-3]  # () unbatched or (B,)
        A_loc = self.anchors_per_loc
        cls = nn.Conv(A_loc * self.num_classes, (1, 1), dtype=self.dtype,
                      name="cls")(x)
        box = nn.Conv(A_loc * 7, (1, 1), dtype=self.dtype, name="box")(x)
        dirc = nn.Conv(A_loc * 2, (1, 1), dtype=self.dtype, name="dir")(x)
        # (..., H, W, A_loc * K) -> (..., H*W*A_loc, K): matches anchor layout
        flat = lambda t, k: t.reshape(lead + (H * W * A_loc, k))  # noqa: E731
        return HeadOutputs(
            cls_logits=flat(cls, self.num_classes),
            box_deltas=flat(box, 7),
            dir_logits=flat(dirc, 2),
        )
