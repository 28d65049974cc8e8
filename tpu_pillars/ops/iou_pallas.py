"""Tiled Pallas rotated-IoU kernel (SURVEY.md section 7 hard part (a): the
rotated-IoU compute inside NMS).

Same exact Green's-theorem math as ops.iou, restructured for the TPU VPU:
the pair matrix is computed in (BI, BJ) tiles held in VMEM, with the tiny
4-edge x 4-half-plane loops UNROLLED in Python — every traced op is an
elementwise op on (BI, 1) / (1, BJ) / (BI, BJ) tiles, and the
(pairs, 4, 4) broadcast intermediates of the XLA formulation (whose last
dim of 4 would waste 97% of each 128-lane register) never exist.

Mosaic notes: the first operand arrives as (BI, C) rows and the second
PRE-TRANSPOSED as (C, BJ) columns, so every in-kernel quantity is natively
2-D (1-D vector reductions / transposes are unsupported ops on TPU Mosaic).

Outputs the full IoU tile; callers apply thresholds/masks (ops.nms).

Measured (v5e, 1024x1024 pairs): 2.9 ms vs 2.5 ms for the XLA formulation —
XLA's fusion already handles this op mix well at NMS scale, so ops.iou stays
the default path; this kernel is kept as the validated Pallas alternative
(and the base for future fusions, e.g. IoU+threshold+triangular mask in one
pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6
_BIG = 1e9


def _corners(xs, ys, ws, ls, yaws):
    """CCW corner list [(cx, cy) x 4], shape-generic ((BI,1) or (1,BJ))."""
    c, s = jnp.cos(yaws), jnp.sin(yaws)
    out = []
    for lx_sign, ly_sign in ((0.5, 0.5), (-0.5, 0.5), (-0.5, -0.5), (0.5, -0.5)):
        lx = lx_sign * ls
        ly = ly_sign * ws
        out.append((xs + c * lx - s * ly, ys + s * lx + c * ly))
    return out


def _half_integral(poly, clip):
    """Sum over `poly` edges of int x dy restricted inside convex `clip`.
    Shape-generic: poly/clip corners are (BI,1)- or (1,BJ)-shaped; plain
    broadcasting produces the (BI, BJ) tile."""
    planes = []
    for h in range(4):
        ax, ay = clip[h]
        bx, by = clip[(h + 1) % 4]
        ex, ey = bx - ax, by - ay
        nx, ny = ey, -ex
        planes.append((nx, ny, nx * ax + ny * ay))

    area = None
    for e in range(4):
        p1x, p1y = poly[e]
        p2x, p2y = poly[(e + 1) % 4]
        dx, dy = p2x - p1x, p2y - p1y
        t_lo = None
        t_hi = None
        for nx, ny, c in planes:
            f0 = p1x * nx + p1y * ny - c
            nd = dx * nx + dy * ny
            parallel = jnp.abs(nd) <= _EPS
            t_star = -f0 / jnp.where(parallel, 1.0, nd)
            ok = f0 <= _EPS
            hi_c = jnp.where(parallel, jnp.where(ok, _BIG, -_BIG),
                             jnp.where(nd > 0, t_star, _BIG))
            lo_c = jnp.where(parallel, jnp.where(ok, -_BIG, _BIG),
                             jnp.where(nd < 0, t_star, -_BIG))
            t_hi = hi_c if t_hi is None else jnp.minimum(t_hi, hi_c)
            t_lo = lo_c if t_lo is None else jnp.maximum(t_lo, lo_c)
        t_hi = jnp.maximum(jnp.minimum(t_hi, 1.0), 0.0)
        t_lo = jnp.minimum(jnp.maximum(t_lo, 0.0), t_hi)
        span = t_hi - t_lo
        sq = 0.5 * (t_hi * t_hi - t_lo * t_lo)
        contrib = dy * (p1x * span + dx * sq)
        area = contrib if area is None else area + contrib
    return area


def _iou_tile_kernel(bi_ref, bjt_ref, out_ref):
    bi = bi_ref[:]                      # (BI, 7)
    bjt = bjt_ref[:]                    # (7, BJ)
    n_i = bi.shape[0]
    n_j = bjt.shape[1]
    xi, yi = bi[:, 0:1], bi[:, 1:2]     # (BI, 1)
    wi, li, ti = bi[:, 3:4], bi[:, 4:5], bi[:, 6:7]
    xj, yj = bjt[0:1, :], bjt[1:2, :]   # (1, BJ)
    wj, lj, tj = bjt[3:4, :], bjt[4:5, :], bjt[6:7, :]

    # re-center each tile at its joint mean (f32 robustness, see ops.iou)
    mx = 0.5 * (jnp.sum(xi) / n_i + jnp.sum(xj) / n_j)
    my = 0.5 * (jnp.sum(yi) / n_i + jnp.sum(yj) / n_j)
    ca = _corners(xi - mx, yi - my, wi, li, ti)   # (BI, 1) corners
    cb = _corners(xj - mx, yj - my, wj, lj, tj)   # (1, BJ) corners

    inter = _half_integral(ca, cb) + _half_integral(cb, ca)
    inter = jnp.maximum(inter, 0.0)

    # disjoint circumradius gate + clamp to min area (exactness guards)
    dx = xi - xj
    dy = yi - yj
    rr = 0.5 * (jnp.sqrt(wi * wi + li * li) + jnp.sqrt(wj * wj + lj * lj))
    inter = jnp.where(dx * dx + dy * dy > rr * rr, 0.0, inter)

    ai = wi * li                        # (BI, 1)
    aj = wj * lj                        # (1, BJ)
    inter = jnp.minimum(inter, jnp.minimum(ai, aj))
    union = jnp.maximum(ai + aj - inter, _EPS)
    out_ref[:] = jnp.clip(inter / union, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("block_i", "block_j", "interpret"))
def rotated_iou_bev_tiled(boxes1, boxes2, block_i: int = 128,
                          block_j: int = 128,
                          interpret: bool | None = None):
    """Pairwise rotated BEV IoU via the tiled Pallas kernel.

    boxes: (N, 7) / (M, 7) packed [x, y, z, w, l, h, yaw]; exact same result
    contract as ops.iou.rotated_iou_bev. Pads N/M internally; interpret mode
    off-TPU so tests run everywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, m = boxes1.shape[0], boxes2.shape[0]
    block_i = min(block_i, n)
    block_j = min(block_j, m)
    n_pad = ((n + block_i - 1) // block_i) * block_i
    m_pad = ((m + block_j - 1) // block_j) * block_j

    def pad(b, target):
        if target == b.shape[0]:
            return b
        filler = jnp.ones((target - b.shape[0], b.shape[1]), b.dtype)
        return jnp.concatenate([b, filler], axis=0)

    b1 = pad(boxes1.astype(jnp.float32), n_pad)
    b2t = pad(boxes2.astype(jnp.float32), m_pad).T   # (7, M) columns

    out = pl.pallas_call(
        _iou_tile_kernel,
        grid=(n_pad // block_i, m_pad // block_j),
        in_specs=[
            pl.BlockSpec((block_i, 7), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, block_j), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(b1, b2t)
    return out[:n, :m]
