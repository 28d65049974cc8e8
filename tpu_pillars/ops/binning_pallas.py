"""Pallas two-pass binning pillarizer — the sort-free replacement for the
argsort at the heart of ``ops.voxelize.pillarize_batch``.

The reference lineage bins points with a sequential host loop (SURVEY.md
section 2 'Pillarizer / voxelizer': "Python/NumPy binning"); round 1 replaced
it with a stable argsort of 524k pillar ids on device, which measured ~160 ms
of the 470 ms batch-4 train step on v5e. This module removes the sort: the
only per-point quantity the canonical spec (ops/voxelize.py module docstring)
actually needs from it is

    rank(i)  = #{j < i : pillar(j) == pillar(i)}       (first-N tie-break)
    count(p) = #points in pillar p (to build the mask)
    occ(p)   = does pillar p exist (to order pillars by ascending id)

and those are a *counting* problem, not a sorting problem. TPU has no usable
scatter-add atomics, but a Pallas grid executes its steps SEQUENTIALLY on a
core, so a running per-sample histogram can live in VMEM across grid steps
and both the lookup (gather) and the update (scatter-add) become one-hot
matmuls on the MXU:

    base  = rowsum( (OneHotRow @ hist) * OneHotCol )     # count before chunk
    hist += OneHotRow^T @ OneHotCol                      # add this chunk

Exactness: every rank is only ever *compared* against N (max points/pillar,
<= 32), so the histogram saturates at CAP = 64 > N. Saturated counts make the
one-hot operands AND the histogram exactly representable in bfloat16, which
keeps all three matmuls on the native bf16 x bf16 -> f32 MXU path (a raw f32
count of a 131k-point ground-plane pillar would not fit bf16's 8-bit
mantissa, forcing ~8x slower f32 matmuls).

Per 1024-point chunk the in-chunk tie-break is a (K, K) lower-triangular
id-equality count on the VPU. Cost at the full operating point
(B=4, M=131072): ~4.3e11 bf16 MACs ~= 2-3 ms on v5e vs ~160 ms for the sort.

The wrapper :func:`pillarize_batch_binned` reproduces the canonical spec
bit-for-bit (tests assert exact equality of every PillarBatch field against
``pillarize_batch``); points are scattered straight from input order — the
post-sort (524k, F) gather disappears as well.

MEASURED OUTCOME (v5e, batch 4 full operating point) — kept as a NON-DEFAULT
alternative: the kernel itself hits its budget (rank+hist 2.9 ms vs 3.6 ms
for the argsort it replaces, and it kills the 9 ms post-sort gather), but
end-to-end the binned path ties the sorted one (43 vs 41 ms) because BOTH are
dominated by XLA's per-index scatters, which cost ~45 cycles per index on TPU
(point scatter 24 ms, pillar table 10 ms, ord gather 6.9 ms). The default
path is ops.emit_pallas, which attacks that actual bottleneck; this module
stays as the measured record of why sort-removal alone is not the win the
round-1 notes predicted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pillars.config import PillarsConfig
from tpu_pillars.ops.voxelize import PillarBatch, decorate

# Saturation cap for the running histogram. Must be > max_points_per_pillar
# (ranks at or beyond the cap only need to stay >= N) and small enough that
# every count is an exact bfloat16 integer (<= 256).
_CAP = 64.0


def _rank_kernel(rows_ref, cols_ref, rank_ref, hist_ref, *, h_bins: int,
                 w_pad: int):
    """One grid step = one (K,) chunk of one sample's points.

    rows in [0, h_bins] (h_bins marks invalid — its one-hot is all-zero so
    invalid points touch nothing); cols in [0, w_pad).
    hist_ref is the (1, h_bins, w_pad) output block for this sample; its
    index map is constant in the chunk axis, so the SAME VMEM block carries
    the running histogram across the sample's sequential grid steps.
    """
    c = pl.program_id(1)
    k = rows_ref.shape[0]

    @pl.when(c == 0)
    def _():
        hist_ref[0] = jnp.zeros((h_bins, w_pad), jnp.float32)

    rows = rows_ref[:].reshape(k, 1)                         # (K, 1) int32
    cols = cols_ref[:].reshape(k, 1)

    bin_r = jax.lax.broadcasted_iota(jnp.int32, (k, h_bins), 1)
    one_r = (rows == bin_r).astype(jnp.bfloat16)             # (K, H)
    bin_c = jax.lax.broadcasted_iota(jnp.int32, (k, w_pad), 1)
    one_c = (cols == bin_c).astype(jnp.bfloat16)             # (K, Wp)

    # count of earlier points in each point's pillar, BEFORE this chunk
    hist = hist_ref[0]                                       # (H, Wp) f32
    picked = jnp.dot(one_r, hist.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)     # (K, Wp)
    base = jnp.sum(picked * one_c.astype(jnp.float32), axis=1)

    # in-chunk exclusive count: earlier chunk slots with the same cell id
    pid = rows * w_pad + cols                                # (K, 1)
    same = pid == pid.reshape(1, k)
    earlier = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
               > jax.lax.broadcasted_iota(jnp.int32, (k, k), 1))
    excl = jnp.sum((same & earlier).astype(jnp.float32), axis=1)

    rank_ref[:] = (base + excl).astype(jnp.int32)

    delta = jax.lax.dot_general(
        one_r, one_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (H, Wp)
    hist_ref[0] = jnp.minimum(hist + delta, _CAP)


@functools.partial(jax.jit,
                   static_argnames=("h_bins", "w_pad", "chunk", "interpret"))
def rank_and_hist(rows, cols, h_bins: int, w_pad: int, chunk: int = 1024,
                  interpret: bool | None = None):
    """rows, cols: (B, M) int32 (row == h_bins marks an invalid point) ->
    (rank (B, M) int32, hist (B, h_bins, w_pad) f32 saturated at 64).

    rank[b, i] = min-saturated count of earlier points of sample b in the
    same cell — exact wherever it is < 64. `interpret` defaults to True
    off-TPU so CPU tests exercise the identical kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, m = rows.shape
    chunk = min(chunk, m)
    chunk = ((chunk + 127) // 128) * 128          # lane-aligned block
    m_pad = ((m + chunk - 1) // chunk) * chunk
    if m_pad != m:
        pad = jnp.full((b, m_pad - m), h_bins, jnp.int32)
        rows = jnp.concatenate([rows, pad], axis=1)
        cols = jnp.concatenate([cols, jnp.zeros_like(pad)], axis=1)
    n_chunks = m_pad // chunk

    # Mosaic wants the last two block dims (8, 128)-divisible or full-size;
    # a flat (B*M,) layout with (chunk,) blocks satisfies that exactly.
    rank, hist = pl.pallas_call(
        functools.partial(_rank_kernel, h_bins=h_bins, w_pad=w_pad),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, j: (i * n_chunks + j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda i, j: (i * n_chunks + j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk,), lambda i, j: (i * n_chunks + j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_bins, w_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * m_pad,), jnp.int32),
            jax.ShapeDtypeStruct((b, h_bins, w_pad), jnp.float32),
        ],
        interpret=interpret,
    )(rows.reshape(-1), cols.reshape(-1))
    return rank.reshape(b, m_pad)[:, :m], hist


def pillarize_batch_binned(points, num_points, config: PillarsConfig,
                           interpret: bool | None = None) -> PillarBatch:
    """Sort-free drop-in for ``pillarize_batch``: same canonical semantics
    (ops/voxelize.py docstring), bit-identical PillarBatch, no argsort and no
    post-sort point gather.
    """
    P = config.max_pillars
    N = config.max_points_per_pillar
    W, H = config.grid_w, config.grid_h
    B, M, F = points.shape
    HW = H * W
    w_pad = ((W + 127) // 128) * 128

    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    pt_idx = jnp.arange(M, dtype=jnp.int32)
    alive = pt_idx[None, :] < num_points[:, None]

    col = jnp.floor((x - config.x_min) / config.voxel_x).astype(jnp.int32)
    row = jnp.floor((y - config.y_min) / config.voxel_y).astype(jnp.int32)
    in_range = (
        (col >= 0) & (col < W) & (row >= 0) & (row < H)
        & (z >= config.z_min) & (z <= config.z_max)
    )
    valid = alive & in_range

    rows_k = jnp.where(valid, row, H)
    cols_k = jnp.where(valid, col, 0)
    rank, hist = rank_and_hist(rows_k, cols_k, H, w_pad, interpret=interpret)

    # pillar ordinals: cells ordered by ascending pillar id among occupied
    count = hist[:, :, :W].reshape(B, HW)                   # saturated at 64
    occ = count > 0.0
    ord_excl = jnp.cumsum(occ.astype(jnp.int32), axis=1) - occ.astype(jnp.int32)

    pid = row * W + col                                      # (B, M)
    ordp = jnp.take_along_axis(ord_excl, jnp.where(valid, pid, 0), axis=1)

    keep = valid & (rank < N) & (ordp < P)
    sample = jnp.arange(B, dtype=jnp.int32)[:, None]
    dest = jnp.where(keep, (sample * P + ordp) * N + rank, B * P * N)

    flat = jnp.zeros((B * P * N + 1, F), points.dtype)
    flat = flat.at[dest.reshape(-1)].set(points.reshape(B * M, F))
    raw = flat[: B * P * N].reshape(B, P, N, F)

    # per-pillar table straight from the occupancy grid (no per-point pass):
    # cell -> (pillar id, capped count) scattered at its ordinal
    cell_pid = jnp.arange(HW, dtype=jnp.int32)[None, :]
    pdest = jnp.where(occ & (ord_excl < P), sample * P + ord_excl, B * P)
    pid_per = jnp.zeros((B * P + 1,), jnp.int32).at[pdest.reshape(-1)].set(
        jnp.broadcast_to(cell_pid, (B, HW)).reshape(-1))
    cnt_per = jnp.zeros((B * P + 1,), jnp.float32).at[pdest.reshape(-1)].set(
        count.reshape(-1))
    pillar_mask = jnp.zeros((B * P + 1,), bool).at[pdest.reshape(-1)].set(True)
    pid_per = pid_per[: B * P].reshape(B, P)
    cnt_per = cnt_per[: B * P].reshape(B, P)
    pillar_mask = pillar_mask[: B * P].reshape(B, P)

    coords = jnp.stack([pid_per // W, pid_per % W], axis=-1) \
        * pillar_mask[..., None]
    n_in_pillar = jnp.minimum(cnt_per, float(N)).astype(jnp.int32)
    mask = (jnp.arange(N, dtype=jnp.int32)[None, None, :]
            < n_in_pillar[:, :, None])

    features = decorate(raw, mask, coords, config)
    return PillarBatch(features, mask, coords, pillar_mask)
