"""Box residual encode/decode vs anchors (SURVEY.md section 2 'Box
encode/decode'; PointPillars/SECOND parameterization).

Residuals are normalized by the anchor BEV diagonal d = sqrt(w_a^2 + l_a^2):
    tx = (x - x_a) / d        tw = log(w / w_a)
    ty = (y - y_a) / d        tl = log(l / l_a)
    tz = (z - z_a) / h_a      th = log(h / h_a)
    tt = yaw - yaw_a          (sin-encoding happens inside the loss)

Pure jnp — runs inside the jitted pipeline on device; also usable from NumPy
inputs on host (jnp on CPU) for the golden-oracle tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def encode_boxes(boxes, anchors):
    """boxes, anchors: (..., 7) [x,y,z,w,l,h,yaw] -> residuals (..., 7)."""
    x, y, z, w, l, h, t = jnp.moveaxis(boxes, -1, 0)
    xa, ya, za, wa, la, ha, ta = jnp.moveaxis(anchors, -1, 0)
    d = jnp.sqrt(wa * wa + la * la)
    return jnp.stack(
        [
            (x - xa) / d,
            (y - ya) / d,
            (z - za) / ha,
            jnp.log(w / wa),
            jnp.log(l / la),
            jnp.log(h / ha),
            t - ta,
        ],
        axis=-1,
    )


def decode_boxes(deltas, anchors):
    """Inverse of :func:`encode_boxes`. (..., 7) -> (..., 7)."""
    tx, ty, tz, tw, tl, th, tt = jnp.moveaxis(deltas, -1, 0)
    xa, ya, za, wa, la, ha, ta = jnp.moveaxis(anchors, -1, 0)
    d = jnp.sqrt(wa * wa + la * la)
    return jnp.stack(
        [
            tx * d + xa,
            ty * d + ya,
            tz * ha + za,
            jnp.exp(tw) * wa,
            jnp.exp(tl) * la,
            jnp.exp(th) * ha,
            tt + ta,
        ],
        axis=-1,
    )
