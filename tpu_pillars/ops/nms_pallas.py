"""Block-gated Pallas overlap matrix for rotated NMS (SURVEY.md section 7
hard part (a); candidate follow-up to the r2/r3 postprocess work).

The XLA fixpoint NMS (ops/nms.py) is exact and loop-free, but it pays for
the FULL K x K rotated-IoU matrix (K = pre_nms_top_k = 1024): ~1M pairs x
~400 VPU flops, even though

  * greedy suppression only reads the upper triangle j < i (score order),
    so the strictly-lower half of the matrix is dead work, and
  * class-aware NMS shifts each class 4*(x_span + y_span) apart in BEV
    (ops/postprocess.py _nms_and_pack), so every cross-class pair — plus
    every far-apart same-class pair — is provably zero by the circumradius
    gate |d| > r_a + r_b that ops/iou.py already applies per pair.

XLA cannot skip that work (dense dataflow, and the tiled Pallas IoU
rewrite without gating already tied XLA: 2.9 vs 2.5 ms, ops/iou_pallas.py).
This kernel skips it at BLOCK granularity: a (TJ, TI) grid over the pair
matrix where

  1. strictly-lower-triangle blocks (bj > bi) write zeros and do nothing;
  2. every surviving block runs the ~6-flop center-distance gate first and
     computes the ~400-flop clipping tile only when at least one pair can
     geometrically overlap (`pl.when` on a scalar min-reduction);
  3. hot blocks evaluate the identical formulas as ops.iou.rotated_iou_bev
     (same per-pair recentering, disjoint gate, clamps) and emit
     (iou > threshold) & (j < i) as a 0/1 f32 tile.

The greedy fixpoint itself is unchanged — rotated_nms_pallas feeds the
kernel's matrix into the same masked any-reduction sweep as
ops.nms.rotated_nms, so suppression semantics (ties by lowest index,
suppressed boxes never suppress) are inherited, not re-derived.

Equivalence: identical formulas, but Mosaic schedules fma contractions
differently from XLA, so pairs whose IoU sits within ulps of the threshold
can flip (the same caveat as ops/assign_pallas.py — see the fma note at
ops/iou.py:92). tests/test_nms_pallas.py pins: overlap matrices equal
everywhere except pairs whose float64 IoU is within 1e-4 of the threshold,
and keep sets equal on scenes with no such boundary pair.

Status: MEASURED WIN — the TPU default via nms_impl="auto" (v5e,
2026-08-18, scripts/probe_nms_pallas.py, batch-8, K=1024, clustered
class-shifted candidates): NMS-only 24.41 ms class-blocked / 24.96
score-order vs 26.83 XLA fixpoint; full wire postprocess 31.20 vs
34.40 ms (~9%); keep sets identical on all 8192 candidates. (Absolute
numbers that day ran ~2x the round-3 records across the board — a
post-outage environment-scale shift; the same-day ratios are the
decision.) Off-TPU, "auto" keeps the XLA fixpoint (interpret-mode Pallas
is test-only slow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pillars.ops.iou import _EPS, _half_edge_integral, corners_bev_jax

_TJ = 128    # suppressor-axis (sublane) block
_TI = 128    # suppressee-axis (lane) block


def _col(ref, k, tj, ti):
    """Payload column k of the j-side (TJ, 16) block -> (TJ, TI) tile."""
    return jnp.broadcast_to(ref[:, k : k + 1], (tj, ti))


def _row(ref, k, tj, ti):
    """Payload row k of the i-side (12, TI) block -> (TJ, TI) tile.

    Sliced 1-D then broadcast_in_dim: Mosaic on v5e rejects (1, TI)
    row-vector broadcasts but handles lane-aligned 1-D -> 2-D fine
    (CLAUDE.md Mosaic limits).
    """
    return lax.broadcast_in_dim(ref[k, :], (tj, ti), (1,))


def _over_kernel(pj_ref, pi_ref, out_ref, *, thr: float):
    bj = pl.program_id(0)
    bi = pl.program_id(1)
    tj, ti = out_ref.shape

    out_ref[...] = jnp.zeros((tj, ti), jnp.float32)

    @pl.when(bj <= bi)
    def _():
        jcx = _col(pj_ref, 8, tj, ti)
        jcy = _col(pj_ref, 9, tj, ti)
        jr = _col(pj_ref, 11, tj, ti)
        icx = _row(pi_ref, 8, tj, ti)
        icy = _row(pi_ref, 9, tj, ti)
        ir = _row(pi_ref, 11, tj, ti)
        dx = jcx - icx
        dy = jcy - icy
        rr = jr + ir
        sep = dx * dx + dy * dy - rr * rr     # > 0 => provably disjoint

        @pl.when(jnp.min(sep) <= 0.0)
        def _():
            jpx = [_col(pj_ref, k, tj, ti) for k in range(4)]
            jpy = [_col(pj_ref, 4 + k, tj, ti) for k in range(4)]
            ipx = [_row(pi_ref, k, tj, ti) for k in range(4)]
            ipy = [_row(pi_ref, 4 + k, tj, ti) for k in range(4)]
            # identical arithmetic to convex_quad_intersect_area: per-pair
            # recentering, both half-edge integrals, clamp at zero
            midx = 0.125 * (jpx[0] + jpx[1] + jpx[2] + jpx[3]
                            + ipx[0] + ipx[1] + ipx[2] + ipx[3])
            midy = 0.125 * (jpy[0] + jpy[1] + jpy[2] + jpy[3]
                            + ipy[0] + ipy[1] + ipy[2] + ipy[3])
            jpx = [x - midx for x in jpx]
            jpy = [y - midy for y in jpy]
            ipx = [x - midx for x in ipx]
            ipy = [y - midy for y in ipy]
            inter = (_half_edge_integral(jpx, jpy, ipx, ipy)
                     + _half_edge_integral(ipx, ipy, jpx, jpy))
            inter = jnp.maximum(inter, 0.0)
            inter = jnp.where(sep > 0.0, 0.0, inter)
            aj = _col(pj_ref, 10, tj, ti)
            ai = _row(pi_ref, 10, tj, ti)
            inter = jnp.minimum(inter, jnp.minimum(aj, ai))
            union = jnp.maximum(aj + ai - inter, _EPS)
            iou = jnp.clip(inter / union, 0.0, 1.0)

            gidx_j = (lax.broadcasted_iota(jnp.int32, (tj, ti), 0)
                      + bj * tj)
            gidx_i = (lax.broadcasted_iota(jnp.int32, (tj, ti), 1)
                      + bi * ti)
            over = (iou > thr) & (gidx_j < gidx_i)
            out_ref[...] = over.astype(jnp.float32)


def _payloads(boxes):
    """boxes (K, 7) -> j-side (K, 16) box-major and i-side (12, K)
    feature-major payloads: corner xs (4), corner ys (4), center (2),
    BEV area, circumradius."""
    corners = corners_bev_jax(boxes)                        # (K, 4, 2)
    area = boxes[:, 3] * boxes[:, 4]
    circ = 0.5 * jnp.sqrt(boxes[:, 3] ** 2 + boxes[:, 4] ** 2)
    feats = jnp.concatenate([
        corners[:, :, 0], corners[:, :, 1],
        boxes[:, 0:1], boxes[:, 1:2], area[:, None], circ[:, None],
    ], axis=1)                                              # (K, 12)
    pj = jnp.concatenate(
        [feats, jnp.zeros((feats.shape[0], 4), feats.dtype)], axis=1)
    return pj, feats.T


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def overlap_matrix_pallas(boxes, iou_threshold: float,
                          interpret: bool | None = None):
    """(K, 7) score-sorted boxes -> (K, K) bool: over[j, i] means the
    higher-ranked j overlaps i beyond the threshold (j < i enforced).

    Same contract as the `over` matrix inside ops.nms.rotated_nms; see the
    module docstring for the ulp-level fma caveat.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = boxes.shape[0]
    k_pad = max(((k + _TI - 1) // _TI) * _TI, _TI)
    if k_pad != k:
        # far-away unit dummies: the in-kernel disjoint gate kills every
        # pair they touch, and [:k, :k] drops their rows/cols anyway
        pad = jnp.tile(
            jnp.asarray([1e7, 1e7, 0, 1, 1, 1, 0], boxes.dtype),
            (k_pad - k, 1))
        boxes = jnp.concatenate([boxes, pad], axis=0)
    pj, pi = _payloads(boxes)
    nb = k_pad // _TI
    out = pl.pallas_call(
        functools.partial(_over_kernel, thr=float(iou_threshold)),
        grid=(nb, nb),
        in_specs=[
            pl.BlockSpec((_TJ, 16), lambda bj, bi: (bj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, _TI), lambda bj, bi: (0, bi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TJ, _TI), lambda bj, bi: (bj, bi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, k_pad), jnp.float32),
        interpret=interpret,
    )(pj, pi)
    return out[:k, :k] > 0.5


@functools.partial(jax.jit, static_argnames=("iou_threshold", "class_gap",
                                             "interpret"))
def rotated_nms_pallas(boxes, scores, valid, iou_threshold: float,
                       class_ids=None, class_gap: float = 0.0,
                       interpret: bool | None = None):
    """Drop-in for ops.nms.rotated_nms with the overlap matrix produced by
    the block-gated kernel; the greedy fixpoint sweep is identical.

    class_ids (K,) int32, optional: when the boxes carry _nms_and_pack's
    class-aware shift, candidates are first permuted into CLASS-BLOCKED
    order (stable — within a class the score order is untouched). This is
    exact WHEN cross-class pairs cannot overlap: then greedy NMS
    decomposes into independent per-class problems whose within-class
    order is all that matters — and every block pair spanning two classes
    becomes a guaranteed gate-skip for the kernel (score-interleaved
    classes would otherwise leave nearly every block with a warm pair).

    class_gap: the per-class shift distance (4*span in _nms_and_pack).
    Decoded box sizes are unclamped (exp of a regression output), so an
    absurd box COULD out-span the shift and re-couple classes; the
    reorder is therefore applied only when 2*max(valid circumradius) <
    class_gap — otherwise the data-dependent permutation degrades to the
    identity and the result stays score-ordered (still correct, fewer
    block skips). Invalid candidates are exempt from the guard: they
    never keep and never suppress, so their geometry cannot change the
    keep set.
    """
    k = boxes.shape[0]
    if class_ids is not None:
        # unique integer key: class-major, original (=score) order minor
        iota = jnp.arange(k, dtype=jnp.int32)
        perm = jnp.argsort(class_ids.astype(jnp.int32) * k + iota)
        if class_gap > 0.0:
            circ = 0.5 * jnp.sqrt(boxes[:, 3] ** 2 + boxes[:, 4] ** 2)
            worst = jnp.max(jnp.where(valid, circ, 0.0))
            perm = jnp.where(2.0 * worst < class_gap, perm, iota)
        inv = jnp.argsort(perm)
        boxes = boxes[perm]
        valid = valid[perm]
    del scores  # order is positional, as in rotated_nms
    over = overlap_matrix_pallas(boxes, iou_threshold, interpret=interpret)

    def sweep(state):
        keep, _, it = state
        suppressed = jnp.any(keep[:, None] & over, axis=0)
        new_keep = valid & ~suppressed
        return new_keep, keep, it + 1

    def cond(state):
        keep, prev, it = state
        return (it == 0) | (jnp.any(keep != prev) & (it < k))

    keep, _, _ = lax.while_loop(
        cond, sweep, (valid, jnp.zeros_like(valid), jnp.zeros((), jnp.int32))
    )
    return keep[inv] if class_ids is not None else keep
