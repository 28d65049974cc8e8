"""Exact rotated-box IoU, fully vectorized jnp (TPU-friendly, static shapes).

Replaces the reference lineage's numba/CUDA rotated-IoU hot loops (SURVEY.md
section 2 'Target assigner' / 'Rotated NMS') with a data-parallel formulation
that XLA maps onto the VPU: the intersection of two convex quadrilaterals is
computed from a fixed 24-slot candidate-vertex buffer
    (4 corners of A inside B) + (4 corners of B inside A)
  + (16 edge-pair intersection points)
ordered by angle around their centroid, then a masked shoelace. No dynamic
shapes, no sequential clipping loop — every pair is independent VPU work.

All functions broadcast over leading batch dims; boxes are packed
``[x, y, z, w, l, h, yaw]`` (the z/h columns are ignored by the BEV ops).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-6


def corners_bev_jax(boxes):
    """(..., 7) -> (..., 4, 2) BEV footprint corners, CCW.

    Same corner order as geometry.boxes.box_corners_bev (the NumPy oracle).
    """
    x, y = boxes[..., 0], boxes[..., 1]
    w, l, yaw = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    lx = jnp.stack([l / 2, -l / 2, -l / 2, l / 2], axis=-1)
    ly = jnp.stack([w / 2, w / 2, -w / 2, -w / 2], axis=-1)
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    gx = x[..., None] + c * lx - s * ly
    gy = y[..., None] + s * lx + c * ly
    return jnp.stack([gx, gy], axis=-1)


def _cross2(o, a, b):
    """2-D cross of (a - o) x (b - o); inputs (..., 2)."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _points_in_convex_quad(pts, quad):
    """pts (..., P, 2) inside CCW quad (..., 4, 2) -> (..., P) bool."""
    a = quad[..., None, :, :]                      # (..., 1, 4, 2)
    b = jnp.roll(quad, -1, axis=-2)[..., None, :, :]
    p = pts[..., :, None, :]                       # (..., P, 1, 2)
    side = _cross2(a, b, p)                        # (..., P, 4)
    return jnp.all(side >= -_EPS, axis=-1)


def _edge_intersections(qa, qb):
    """All 16 edge-pair intersection points of two quads.

    qa, qb: (..., 4, 2) -> points (..., 16, 2), valid (..., 16) bool.
    """
    a1 = qa[..., :, None, :]                       # (..., 4, 1, 2)
    a2 = jnp.roll(qa, -1, axis=-2)[..., :, None, :]
    b1 = qb[..., None, :, :]                       # (..., 1, 4, 2)
    b2 = jnp.roll(qb, -1, axis=-2)[..., None, :, :]
    r = a2 - a1                                    # (..., 4, 1, 2)
    s = b2 - b1                                    # (..., 1, 4, 2)
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]        # (..., 4, 4)
    d = b1 - a1
    t_num = d[..., 0] * s[..., 1] - d[..., 1] * s[..., 0]
    u_num = d[..., 0] * r[..., 1] - d[..., 1] * r[..., 0]
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    t = t_num / safe
    u = u_num / safe
    valid = (
        (jnp.abs(denom) > _EPS)
        & (t >= -_EPS) & (t <= 1 + _EPS)
        & (u >= -_EPS) & (u <= 1 + _EPS)
    )
    pt = a1 + t[..., None] * r                      # (..., 4, 4, 2)
    batch = qa.shape[:-2]
    return pt.reshape(batch + (16, 2)), valid.reshape(batch + (16,))


def convex_quad_intersect_area(qa, qb):
    """Intersection area of CCW quads qa, qb: (..., 4, 2) -> (...,)."""
    in_ab = _points_in_convex_quad(qa, qb)          # (..., 4)
    in_ba = _points_in_convex_quad(qb, qa)          # (..., 4)
    xpts, xval = _edge_intersections(qa, qb)        # (..., 16, 2), (..., 16)

    pts = jnp.concatenate([qa, qb, xpts], axis=-2)             # (..., 24, 2)
    mask = jnp.concatenate([in_ab, in_ba, xval], axis=-1)      # (..., 24)

    count = jnp.sum(mask, axis=-1)                              # (...,)
    fmask = mask[..., None].astype(pts.dtype)
    centroid = jnp.sum(pts * fmask, axis=-2) / jnp.maximum(
        count[..., None].astype(pts.dtype), 1.0
    )
    rel = pts - centroid[..., None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(mask, ang, jnp.inf)             # invalid slots sort last
    order = jnp.argsort(ang, axis=-1)
    sorted_pts = jnp.take_along_axis(pts, order[..., None], axis=-2)

    idx = jnp.arange(pts.shape[-2])
    nxt = jnp.where(idx[None] + 1 < count[..., None], idx + 1, 0)  # wrap at k
    nxt = jnp.broadcast_to(nxt, sorted_pts.shape[:-1])
    nxt_pts = jnp.take_along_axis(sorted_pts, nxt[..., None], axis=-2)

    contrib = (
        sorted_pts[..., 0] * nxt_pts[..., 1] - sorted_pts[..., 1] * nxt_pts[..., 0]
    )
    live = idx[None] < count[..., None]
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(live, contrib, 0.0), axis=-1))
    return jnp.where(count >= 3, area, 0.0)


@jax.jit
def rotated_iou_bev(boxes1, boxes2):
    """Pairwise rotated BEV IoU. boxes1 (N, 7), boxes2 (M, 7) -> (N, M).

    Materializes the full N x M candidate buffer (~200 B/pair); for large N
    use :func:`rotated_iou_bev_chunked`.
    """
    c1 = corners_bev_jax(boxes1)[:, None]           # (N, 1, 4, 2)
    c2 = corners_bev_jax(boxes2)[None, :]           # (1, M, 4, 2)
    n, m = boxes1.shape[0], boxes2.shape[0]
    inter = convex_quad_intersect_area(
        jnp.broadcast_to(c1, (n, m, 4, 2)), jnp.broadcast_to(c2, (n, m, 4, 2))
    )
    a1 = (boxes1[:, 3] * boxes1[:, 4])[:, None]
    a2 = (boxes2[:, 3] * boxes2[:, 4])[None, :]
    # intersection can never exceed either area; clamping also zeroes the
    # garbage candidate hull a degenerate (zero-size) box would produce
    inter = jnp.minimum(inter, jnp.minimum(a1, a2))
    union = jnp.maximum(a1 + a2 - inter, _EPS)
    return jnp.clip(inter / union, 0.0, 1.0)


@partial(jax.jit, static_argnames="chunk")
def rotated_iou_bev_chunked(boxes1, boxes2, chunk: int = 4096):
    """Row-chunked rotated BEV IoU for large boxes1 (e.g. the full anchor
    grid vs GT boxes in the target assigner). Pads N up to a multiple of
    `chunk` and maps over chunks to bound transient memory."""
    n = boxes1.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    padded = jnp.concatenate(
        [boxes1, jnp.ones((n_pad - n, boxes1.shape[1]), boxes1.dtype)], axis=0
    ).reshape(n_pad // chunk, chunk, boxes1.shape[1])
    out = jax.lax.map(lambda rows: rotated_iou_bev(rows, boxes2), padded)
    return out.reshape(n_pad, boxes2.shape[0])[:n]


@jax.jit
def iou_3d(boxes1, boxes2):
    """Pairwise 3-D IoU: rotated BEV intersection x z-overlap over volume
    union. Used by the Lyft mAP evaluation protocol (SURVEY.md 3.3)."""
    c1 = corners_bev_jax(boxes1)[:, None]
    c2 = corners_bev_jax(boxes2)[None, :]
    n, m = boxes1.shape[0], boxes2.shape[0]
    inter_bev = convex_quad_intersect_area(
        jnp.broadcast_to(c1, (n, m, 4, 2)), jnp.broadcast_to(c2, (n, m, 4, 2))
    )
    z1_lo = boxes1[:, 2] - boxes1[:, 5] / 2
    z1_hi = boxes1[:, 2] + boxes1[:, 5] / 2
    z2_lo = boxes2[:, 2] - boxes2[:, 5] / 2
    z2_hi = boxes2[:, 2] + boxes2[:, 5] / 2
    z_olap = jnp.maximum(
        jnp.minimum(z1_hi[:, None], z2_hi[None, :])
        - jnp.maximum(z1_lo[:, None], z2_lo[None, :]),
        0.0,
    )
    inter_bev = jnp.minimum(
        inter_bev,
        jnp.minimum((boxes1[:, 3] * boxes1[:, 4])[:, None],
                    (boxes2[:, 3] * boxes2[:, 4])[None, :]),
    )
    inter = inter_bev * z_olap
    v1 = (boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])[:, None]
    v2 = (boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])[None, :]
    union = jnp.maximum(v1 + v2 - inter, _EPS)
    return jnp.clip(inter / union, 0.0, 1.0)
