"""Decoration-free fused PFN: pillar features straight from the emit
kernel's flat table, the round-3 answer to VERDICT weak spot #2 ("decorate
+ PFN round trip").

The serving pipeline used to be:  emit table (rows, N*F) -> reshape to the
(B, P, N, F) padded view -> decorate to (B, P, N, F+5) (~6.7 ms at batch 8,
and the (N, 9) minor dims tile at 14x lane padding) -> PFN kernel. All of
that exists only to feed ONE linear layer. But the PFN's linear is linear
in the decorated features, and the decoration itself is affine in the raw
point features given the pillar's mean and cell center:

    d_j = [x_j, y_j, z_j, i_j(, dt_j), x_j-mx, y_j-my, z_j-mz,
           x_j-cx, y_j-cy]

and, working in CELL-CENTERED locals x' = x - cx, y' = y - cy (cx, cy =
the point's cell center, so xp = x' exactly and xc = x' - mx'):

    W^T d_j + b = W_eff^T r'_j + t,   r'_j = [x', y', z, i(, dt)]
        W_eff[x] = W[x] + W[xc] + W[xp]   (similarly y; z gets W[zc])
        t        = b + cx W[x] + cy W[y] - mx' W[xc] - my' W[yc] - mz W[zc]

The locals matter for PRECISION, not just algebra: the kernel's matmul is
one bf16 MXU pass, and bf16(raw x ~ 100 m) quantizes at ~0.3 m — measured
0.40 m p99 box-center drift vs the classic path before centering, 0.061 m
p99 after (yaw 0.054 -> 0.0056 rad; score 0.034 -> 0.009; trained
full-config model, v5e). t is per-PILLAR, not per-point — and ReLU is
monotone, so the masked max commutes past it:

    max_j relu(W^T d_j + b) = relu(max_j (W_eff^T r'_j) + t).

So the kernel below consumes the emit table's flat (rows, lanes) layout
directly (zero decorated tensors, zero padded round trips): one matmul
against a block-diagonal kron(I_N, W_eff) gives every point's C-vector in
lane-segment layout, a log2(N) ladder of circular lane rolls max-reduces
the segments, and the per-pillar bias t comes from the emit kernel's meta
sums (rows 2-4) + pillar id (cell center) in-register. Numerics are NOT
bit-identical to decorate+PFN (same algebra, different rounding/product
order) — parity is pinned to tolerance in tests/test_fused_pfn.py, and the
exact-contract pillarizer tests are unaffected (they run the un-fused
path).

Measured v5e, batch 8 full config (r3): points -> canvas 44.1 ms classic
(pillarize+decorate+PFN+ring scatter) vs 21.9 ms fused; the sort+emit+PFN
sub-stage is 13.6 ms vs classic's 18.4 ms sort+emit+decorate with PFN and
the padded-view materialization still to pay. Canvas parity vs the classic
path: 5.8e-3 max relative (single-pass bf16 MXU rounding on both sides,
different product orders).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pillars.config import PillarsConfig
from tpu_pillars.ops.emit_pallas import emit_table_flat, sort_points_by_pillar

_BLOCK = 256      # pillar rows per grid step


def fold_decoration(w, b, config: PillarsConfig):
    """Folded decorated-space PFN weights (D, C), (C,) -> the fused form,
    for CELL-CENTERED point payloads (x' = x - cx, y' = y - cy with
    (cx, cy) the point's own cell center — pillarize_pfn_fused feeds the
    emit kernel these locals so the kernel's bf16 MXU pass quantizes
    +-voxel-scale values instead of +-100 m raw coordinates; measured
    drift vs the classic path dropped ~10x).

    With locals, xp = x - cx = x' exactly and xc = x - mean = x' - mean',
    so (derivation in the module docstring):

        W^T d + b = W_eff^T [x', y', z, i(, dt)]
                    + (b + cx w_x + cy w_y - mx' w_xc - my' w_yc - mz w_zc)

    Returns (w_eff (F, C), w_dec (8, C) rows
    [w_xc, w_yc, w_zc, -w_x, -w_y, b, 0, 0]) — the sign flip lets the
    kernel keep its one t-formula (it subtracts rows 3/4 times the cell
    center).

    Decorated layout (ops/voxelize.py decorate): raw F cols, then
    (xc, yc, zc) mean offsets, then (xp, yp) cell-center offsets.
    """
    F = config.num_raw_features + (1 if config.num_sweeps > 1 else 0)
    C = w.shape[1]
    assert w.shape[0] == F + 5, (w.shape, F)
    w_eff = jnp.concatenate([
        (w[0] + w[F + 0] + w[F + 3])[None],      # x
        (w[1] + w[F + 1] + w[F + 4])[None],      # y
        (w[2] + w[F + 2])[None],                 # z
        w[3:F],                                  # intensity (, dt)
    ], axis=0)
    w_dec = jnp.concatenate(
        [w[F:F + 3], -w[0][None], -w[1][None], b[None],
         jnp.zeros((2, C), w.dtype)], axis=0)
    return w_eff, w_dec


def _fpfn_kernel(tab_ref, side_ref, wbig_ref, wdec_ref, out_ref, *,
                 n: int, c: int, x_min: float, y_min: float,
                 vx: float, vy: float, w_grid: int):
    block = tab_ref.shape[0]
    nc = n * c

    # every point's pre-activation, in (point-segment, channel) lane layout
    pre = jax.lax.dot_general(
        tab_ref[:], wbig_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (block, N*C)

    cnt = side_ref[:, 0:1]                               # (block, 1) f32
    seg = jax.lax.broadcasted_iota(jnp.int32, (block, nc), 1) // c
    pre = jnp.where(seg.astype(jnp.float32) < cnt, pre, -1e9)

    # masked max over the N segments: log2(N) circular-roll ladder — after
    # the last round every segment holds the global (per-row) max
    shift = c
    while shift < nc:
        pre = jnp.maximum(pre, pltpu.roll(pre, shift=shift, axis=1))
        shift *= 2
    smax = pre[:, :c]                                    # (block, C)

    # per-pillar decoration bias t from the meta sidecar
    pid = side_ref[:, 1:2].astype(jnp.int32)
    col = (pid % w_grid).astype(jnp.float32)
    row = (pid // w_grid).astype(jnp.float32)
    cx = x_min + (col + 0.5) * vx
    cy = y_min + (row + 0.5) * vy
    inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
    mx = side_ref[:, 2:3] * inv_cnt
    my = side_ref[:, 3:4] * inv_cnt
    mz = side_ref[:, 4:5] * inv_cnt

    def wrow(i):
        return jax.lax.broadcast_in_dim(wdec_ref[i, :], (block, c), (1,))

    t = (wrow(5) - mx * wrow(0) - my * wrow(1) - mz * wrow(2)
         - cx * wrow(3) - cy * wrow(4))
    out_ref[:] = jnp.where(cnt > 0.0, jnp.maximum(smax + t, 0.0), 0.0)


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def pfn_from_table(table_flat, meta, w_eff, w_dec, config: PillarsConfig,
                   interpret: bool | None = None):
    """Flat emit outputs -> pillar features.

    table_flat (B*P_pad, lanes), meta (B*8, P_pad) (emit_table_flat),
    w_eff (F, C), w_dec (8, C) (fold_decoration) ->
      feats (B, P_pad, C) f32, pid_per (B, P_pad) int32, cnt (B, P_pad) f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = config.max_points_per_pillar
    F = w_eff.shape[0]
    C = w_eff.shape[1]
    lanes = table_flat.shape[1]
    p_pad = meta.shape[1]
    B = meta.shape[0] // 8
    rows = B * p_pad
    assert N & (N - 1) == 0, "fused PFN needs a power-of-two points/pillar"
    assert table_flat.shape[0] == rows

    # (lanes, N*C) block-diagonal weight: row j*F+f -> lanes [j*C, (j+1)*C)
    wbig = jnp.kron(jnp.eye(N, dtype=w_eff.dtype), w_eff)
    if lanes > N * F:
        wbig = jnp.concatenate(
            [wbig, jnp.zeros((lanes - N * F, N * C), w_eff.dtype)], axis=0)

    # meta sidecar: (B, 8, P_pad) -> (B*P_pad, 8) so pillar rows align with
    # the table's row axis
    side = jnp.swapaxes(meta.reshape(B, 8, p_pad), 1, 2).reshape(rows, 8)

    block = min(_BLOCK, rows)
    assert rows % block == 0, (rows, block)
    out = pl.pallas_call(
        functools.partial(
            _fpfn_kernel, n=N, c=C, x_min=config.x_min, y_min=config.y_min,
            vx=config.voxel_x, vy=config.voxel_y, w_grid=config.grid_w),
        grid=(rows // block,),
        in_specs=[
            pl.BlockSpec((block, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, N * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), jnp.float32),
        interpret=interpret,
    )(table_flat, side.astype(jnp.float32), wbig.astype(jnp.float32),
      w_dec.astype(jnp.float32))

    cnt = meta.reshape(B, 8, p_pad)[:, 0, :]
    pid_per = meta.reshape(B, 8, p_pad)[:, 1, :].astype(jnp.int32)
    return out.reshape(B, p_pad, C), pid_per, cnt


def pillarize_pfn_fused(points, num_points, w, b, config: PillarsConfig,
                        interpret: bool | None = None):
    """The fused serving front end: (B, M, F) points + folded decorated-
    space PFN weights (fold_bn output) ->
      (pillar_feats (B, P, C) f32, pid_per (B, P) int32,
       pillar_mask (B, P) bool)
    — ready for the BEV scatter. Replaces pillarize + decorate + PFN."""
    P = config.max_pillars
    N = config.max_points_per_pillar
    HW = config.grid_h * config.grid_w
    F = points.shape[-1]

    gid_s, pts_s = sort_points_by_pillar(points, num_points, config)
    # CELL-CENTER the sorted payload (exact f32 subtracts): the kernel's
    # single-pass bf16 matmul then quantizes +-voxel-scale locals instead
    # of +-100 m raw coordinates — the box-regression-critical offsets
    # (xc, xp) keep their precision. Invalid rows (pid == HW) get a
    # harmless out-of-grid center; they are never kept. Meta sums become
    # sums of locals, which is exactly what fold_decoration's t expects.
    col = (gid_s % config.grid_w).astype(jnp.float32)
    row = (gid_s // config.grid_w).astype(jnp.float32)
    cx = config.x_min + (col + 0.5) * config.voxel_x
    cy = config.y_min + (row + 0.5) * config.voxel_y
    pts_s = jnp.concatenate([
        (pts_s[..., 0] - cx)[..., None],
        (pts_s[..., 1] - cy)[..., None],
        pts_s[..., 2:],
    ], axis=-1)
    table, meta = emit_table_flat(gid_s, pts_s, N, F, P, HW,
                                  interpret=interpret)
    w_eff, w_dec = fold_decoration(w, b, config)
    feats, pid_per, cnt = pfn_from_table(table, meta, w_eff, w_dec, config,
                                         interpret=interpret)
    return feats[:, :P], pid_per[:, :P], cnt[:, :P] > 0.0
