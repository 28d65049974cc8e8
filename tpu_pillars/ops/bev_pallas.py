"""Pallas BEV canvas builder: dense block gather instead of an XLA scatter.

scatter_to_bev (ops/voxelize.py) is a 96k-row XLA scatter at batch 8 and
costs 14.7 ms on v5e (~45 cycles per index — the same pathology the
window-emit pillarizer removed from the table build). This kernel replaces
it with a DENSE formulation that exploits the pillar table's ordering
guarantee: the emit/sort pillarizers produce pillars in ascending
pillar-id order, so the pillars landing in any contiguous block of canvas
cells form one contiguous range of pillar-table rows.

  * the canvas is viewed as (HW/cpr, cpr*C) with cpr = 128//C cells packed
    per 128-lane row — the same bytes as (H, W, C) row-major, so the final
    reshape is free;
  * grid = (B, HW/cpr/R) output blocks of R rows; a broadcast-compare
    count (lo[b, j] = #pillars with id below the block start — NOT
    jnp.searchsorted, whose scan lowering cost 7.5 ms) gives each block
    its pillar range [lo, hi), scalar-prefetched so the BlockSpec index
    maps can stage exactly the right slab;
  * each step stages TWO consecutive KMAX-row slabs of the pillar table
    (block index lo//KMAX and the next — [lo, hi) always fits because
    hi - lo <= cells-per-block = KMAX), builds the one-hot of each
    pillar's block row, and expands with three bf16 matmuls (exact
    hi/mid/lo mantissa split, one pillar per cell -> bit-identical f32);
  * empty cells fall out as zeros of the matmul — no zero-init pass, no
    ring buffer, no DMA bookkeeping, no data-dependent loops (an earlier
    ring-window variant with dynamic flush loops hung the chip): every
    canvas block is written exactly once by its own grid step.

Status: this block-gather variant (scatter_to_bev_emit) is bit-exact vs
the XLA scatter on v5e but only ties it (14.3 vs 14.6 ms at batch 8) —
kept NON-DEFAULT as the measured record. The live inference default is the
streaming ring kernel below (scatter_to_bev_ring, 9.9 vs 14.6 ms at
batch 8): `scatter_to_bev_auto` dispatches to it on TPU for compatible
geometries and falls back to the XLA scatter elsewhere.

Requires C | 128 and an R (multiple of 8, dividing HW/cpr) — both hold for
every shipped config; callers fall back to the XLA scatter otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pillars.config import PillarsConfig


def _pick_rows(hwr: int) -> int:
    """Largest multiple of 8 that divides hwr, capped at 512 (block-size
    sweet spot: grid-step overhead vs quadratic one-hot cost)."""
    best = 0
    for r in range(8, 513, 8):
        if hwr % r == 0:
            best = r
    return best


def _bev_kernel(lo_ref, featsA, featsB, pidA, pidB, out_ref, *, c: int,
                cpr: int, r_rows: int, kmax: int, nblocks: int, p_tot: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    k2 = 2 * kmax

    lo = lo_ref[b * (nblocks + 1) + j]
    hi = lo_ref[b * (nblocks + 1) + j + 1]
    base = ((b * p_tot + lo) // kmax) * kmax          # global staged row 0

    feats = jnp.concatenate([featsA[:], featsB[:]], axis=0)   # (2K, C) f32
    pid = jnp.concatenate([pidA[:, 0:1], pidB[:, 0:1]], axis=0)  # (2K, 1)

    idx = base + jax.lax.broadcasted_iota(jnp.int32, (k2, 1), 0)
    valid = (idx >= b * p_tot + lo) & (idx < b * p_tot + hi)

    cell = pid.astype(jnp.int32) - j * (r_rows * cpr)  # cell offset in block
    row = cell // cpr                                   # target block row
    lane_g = cell - row * cpr                           # cell slot in row

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (k2, r_rows), 1)
    one_hot = ((row == row_iota) & valid).astype(jnp.bfloat16)

    # exact 3-way bf16 mantissa split of the features (see emit_pallas)
    hi_p = feats.astype(jnp.bfloat16)
    r1 = feats - hi_p.astype(jnp.float32)
    mid_p = r1.astype(jnp.bfloat16)
    lo_p = (r1 - mid_p.astype(jnp.float32)).astype(jnp.bfloat16)

    acc = jnp.zeros((r_rows, cpr * c), jnp.float32)
    contract0 = (((0,), (0,)), ((), ()))
    for part in (hi_p, mid_p, lo_p):
        # place each pillar's C lanes at its cell's slot within the row
        pieces = []
        for g in range(cpr):
            m_g = (lane_g == g).astype(jnp.bfloat16)    # (2K, 1)
            pieces.append(part * m_g)
        y = jnp.concatenate(pieces, axis=1)             # (2K, cpr*C)
        acc = acc + jax.lax.dot_general(
            one_hot, y, contract0, preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def scatter_to_bev_emit(pillar_features, pid_per, pillar_mask,
                        config: PillarsConfig, interpret: bool | None = None):
    """(B, P, C) pillar features + (B, P) ascending pillar ids (+ validity)
    -> (B, H, W, C) canvas. Bit-identical to scatter_to_bev given the pillar
    table's ascending-id ordering."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = config.grid_h, config.grid_w
    B, P, C = pillar_features.shape
    HW = H * W
    cpr = 128 // C
    hwr = HW // cpr
    r_rows = _pick_rows(hwr)
    nblocks = hwr // r_rows
    kmax = r_rows * cpr

    # sentinel ids for empty slots keep the per-sample id stream ascending;
    # block starts via one dense comparison count (a jnp.searchsorted here
    # measured 7.5 ms of scan lowering on v5e — this is ~20M VPU flops)
    pid_eff = jnp.where(pillar_mask, pid_per, HW)
    bounds = jnp.arange(nblocks + 1, dtype=jnp.int32) * kmax
    lo = jnp.sum(pid_eff[:, :, None] < bounds[None, None, :],
                 axis=1, dtype=jnp.int32)                       # (B, nb+1)

    # pad the pillar axis so every (lo//KMAX, +1) block pair exists — 2*KMAX
    # of slack covers blockB of the last sample's tail
    p_pad = ((P + kmax - 1) // kmax) * kmax
    p_tot = p_pad + 2 * kmax
    pad_rows = p_tot - P
    feats = jnp.concatenate(
        [pillar_features.astype(jnp.float32),
         jnp.zeros((B, pad_rows, C), jnp.float32)], axis=1)
    pid_f = jnp.concatenate(
        [pid_eff.astype(jnp.float32), jnp.zeros((B, pad_rows), jnp.float32)],
        axis=1)
    feats = feats.reshape(B * p_tot, C)
    # pillar ids ride an (N, 8) f32 sidecar (2-D so Mosaic accepts the
    # block shape; ids < 2^24 are exact in f32)
    pid8 = jnp.broadcast_to(pid_f.reshape(B * p_tot, 1), (B * p_tot, 8))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((kmax, C),
                         lambda b, j, lo_ref:
                         ((b * p_tot + lo_ref[b * (nblocks + 1) + j])
                          // kmax, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kmax, C),
                         lambda b, j, lo_ref:
                         ((b * p_tot + lo_ref[b * (nblocks + 1) + j])
                          // kmax + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kmax, 8),
                         lambda b, j, lo_ref:
                         ((b * p_tot + lo_ref[b * (nblocks + 1) + j])
                          // kmax, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kmax, 8),
                         lambda b, j, lo_ref:
                         ((b * p_tot + lo_ref[b * (nblocks + 1) + j])
                          // kmax + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_rows, cpr * C),
                               lambda b, j, lo_ref: (b * nblocks + j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_bev_kernel, c=C, cpr=cpr, r_rows=r_rows,
                          kmax=kmax, nblocks=nblocks, p_tot=p_tot),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * hwr, cpr * C), jnp.float32),
        interpret=interpret,
    )(lo.reshape(-1), feats, feats, pid8, pid8)
    return out.reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def scatter_to_bev_ring_diff(pillar_features, pid_per, pillar_mask,
                             config: PillarsConfig):
    """Differentiable ring scatter for TRAINING: the streaming ring kernel
    forward (bit-exact, ~2x the XLA scatter) + an explicit row-gather
    backward. The scatter writes each valid pillar's C features to its own
    canvas cell exactly once, so the cotangent of `pillar_features` is
    simply the canvas cotangent read back at each pillar's cell (a
    sublane-axis row gather — cheap; it is the LANE-axis gathers that are
    pathological on TPU, CLAUDE.md). Same contract/precondition as
    scatter_to_bev_ring (ascending pillar ids per sample)."""
    return scatter_to_bev_ring(pillar_features, pid_per, pillar_mask, config)


def _ring_diff_fwd(pillar_features, pid_per, pillar_mask,
                   config: PillarsConfig):
    out = scatter_to_bev_ring(pillar_features, pid_per, pillar_mask, config)
    return out, (pid_per, pillar_mask)


def _ring_diff_bwd(config: PillarsConfig, res, g):
    pid_per, pillar_mask = res
    H, W = config.grid_h, config.grid_w
    B, P = pid_per.shape
    C = g.shape[-1]
    g2 = g.reshape(B, H * W, C)
    idx = jnp.where(pillar_mask, pid_per, 0).astype(jnp.int32)
    feats_bar = jnp.take_along_axis(g2, idx[..., None], axis=1)
    feats_bar = feats_bar * pillar_mask[..., None].astype(feats_bar.dtype)
    return feats_bar, None, None


scatter_to_bev_ring_diff.defvjp(_ring_diff_fwd, _ring_diff_bwd)


def scatter_to_bev_train_auto(pillar_features, coords_or_pid, pillar_mask,
                              config: PillarsConfig, is_pid: bool = True):
    """Training-path BEV scatter dispatcher: the differentiable ring kernel
    on TPU for compatible geometries (forward ~2x the XLA scatter; backward
    is one row gather), the XLA scatter (whose transpose XLA derives)
    elsewhere. Same ascending-pillar-id precondition as scatter_to_bev_auto
    on the TPU path."""
    from tpu_pillars.ops.voxelize import scatter_to_bev

    C = pillar_features.shape[-1]
    H, W = config.grid_h, config.grid_w
    if is_pid:
        pid = coords_or_pid
    else:
        pid = coords_or_pid[..., 0] * W + coords_or_pid[..., 1]
    ok = jax.default_backend() == "tpu" and 128 % C == 0
    if ok:
        hwr = (H * W) // (128 // C)
        ok = any(hwr % r == 0 for r in range(8, 1025, 8))
    if ok:
        return scatter_to_bev_ring_diff(pillar_features, pid, pillar_mask,
                                        config)
    coords = (jnp.stack([pid // W, pid % W], axis=-1)
              * pillar_mask[..., None]) if is_pid else coords_or_pid
    return scatter_to_bev(pillar_features, coords, pillar_mask, config)


def scatter_to_bev_auto_pid(pillar_features, pid_per, pillar_mask,
                            config: PillarsConfig):
    """scatter_to_bev_auto for callers that carry flat pillar ids instead
    of (row, col) coords (the fused front end). Same precondition: pillars
    ascending by id per sample. Batched only: (B, P, C) -> (B, H, W, C)."""
    from tpu_pillars.ops.voxelize import scatter_to_bev

    C = pillar_features.shape[-1]
    H, W = config.grid_h, config.grid_w
    ok = jax.default_backend() == "tpu" and 128 % C == 0
    if ok:
        hwr = (H * W) // (128 // C)
        ok = any(hwr % r == 0 for r in range(8, 1025, 8))
    if ok:
        return scatter_to_bev_ring(pillar_features, pid_per, pillar_mask,
                                   config)
    coords = jnp.stack([pid_per // W, pid_per % W], axis=-1) \
        * pillar_mask[..., None]
    return scatter_to_bev(pillar_features, coords, pillar_mask, config)


def scatter_to_bev_auto(pillar_features, coords, pillar_mask,
                        config: PillarsConfig):
    """BEV scatter dispatcher (inference paths; training keeps the XLA
    scatter, whose transpose XLA derives for the backward pass). On TPU
    with a compatible geometry the streaming ring kernel wins: 9.9 vs
    14.6 ms at batch 8, bit-exact. The block-gather variant measured a tie
    (14.3 ms) and is kept only as the measured record. Off-TPU, or for
    channel counts that don't divide 128, this falls back to the XLA
    scatter.

    PRECONDITION (TPU path): pillars must be ordered by ascending pillar id
    per sample — the ordering every shipped pillarizer guarantees (canonical
    spec rule 3, ops/voxelize.py). The ring kernel's flush schedule relies
    on it; unsorted coords would produce a silently wrong canvas. Callers
    with arbitrary ordering must use ops.voxelize.scatter_to_bev."""
    from tpu_pillars.ops.voxelize import scatter_to_bev

    C = pillar_features.shape[-1]
    H, W = config.grid_h, config.grid_w
    ok = jax.default_backend() == "tpu" and 128 % C == 0
    if ok:
        hwr = (H * W) // (128 // C)
        ok = any(hwr % r == 0 for r in range(8, 1025, 8))
    if not ok:
        return scatter_to_bev(pillar_features, coords, pillar_mask, config)
    unbatched = pillar_features.ndim == 2
    if unbatched:
        pillar_features = pillar_features[None]
        coords = coords[None]
        pillar_mask = pillar_mask[None]
    pid = coords[..., 0] * W + coords[..., 1]
    out = scatter_to_bev_ring(pillar_features, pid, pillar_mask, config)
    return out[0] if unbatched else out


# ---------------------------------------------------------------------------
# Ring-window streaming variant: grid over pillar chunks (sequential), VMEM
# ring over canvas rows, flush-interleaved masked adds. No per-block
# worst-case staging and no host-side prep at all — the candidate to beat
# both the XLA scatter and the block gather. A first attempt hung the
# device: its DMA semaphore was allocated as the bare class
# (pltpu.SemaphoreType.DMA) instead of an instance (DMA(())), so the
# flush's wait() blocked on a semaphore no copy ever signalled.
#
# Triple-buffered flush (overlap the half-window copy with the next add
# round): evaluated r3 and DECLINED on arithmetic. Each flush copies
# whalf x 128 f32 = 512 KB VMEM->HBM (~0.7 us at HBM rate); ~80 flushes
# per full-config sample is ~60 us of copy — <1% of the measured 9.9 ms
# stage, whose cost is the add-round one-hot matmuls (they scale with
# window width: the whalf sweep measured 1000 optimal, 2000 WORSE). A
# third buffer either grows wrows 2000 -> 3000 (x1.5 add cost, several
# ms) or shrinks whalf to 640 (more flush rounds) to hide <0.1 ms of
# copy. Projected net loss in every geometry; not built.
# ---------------------------------------------------------------------------

_RCHUNK = 128     # pillars per grid step (2026-08-19 sweep, b8 standalone
                  # chained loop: r128/w400 7.75 ms vs the old r256/w1000
                  # 8.88; r128/w640 7.82, r64/w320 8.30, r256/w1600 9.02 —
                  # per-round cost scales with rchunk x window rows, and
                  # r128/w400 is the measured basin)


def _bev_ring_kernel(feats_ref, pid_ref, out_ref, win_ref, carry_ref, sem, *,
                     c: int, cpr: int, whalf: int, hwr: int, n_chunks: int,
                     rchunk: int = _RCHUNK, steady_overwrite: bool = False):
    b = pl.program_id(0)
    j = pl.program_id(1)
    wrows = 2 * whalf
    k = rchunk

    @pl.when(j == 0)
    def _():
        win_ref[:] = jnp.zeros((wrows, cpr * c), jnp.float32)
        carry_ref[0] = 0

    pid = pid_ref[:, 0:1].astype(jnp.int32)                  # (K, 1)
    valid = pid < hwr * cpr
    row = jnp.where(valid, pid // cpr, hwr)                  # canvas row
    lane_g = pid - row * cpr
    max_row = jnp.max(jnp.where(valid, row, -1))

    feats = feats_ref[:]                                     # (K, C) f32
    hi_p = feats.astype(jnp.bfloat16)
    r1 = feats - hi_p.astype(jnp.float32)
    mid_p = r1.astype(jnp.bfloat16)
    lo_p = (r1 - mid_p.astype(jnp.float32)).astype(jnp.bfloat16)
    pieces = []
    for part in (hi_p, mid_p, lo_p):
        row_parts = []
        for g in range(cpr):
            m_g = (lane_g == g).astype(jnp.bfloat16)
            row_parts.append(part * m_g)
        pieces.append(jnp.concatenate(row_parts, axis=1))    # (K, cpr*C)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (k, wrows), 1)
    half_iota = jax.lax.broadcasted_iota(jnp.int32, (k, whalf), 1)
    contract0 = (((0,), (0,)), ((), ()))

    def flush(base):
        base = pl.multiple_of(base, whalf)
        half_off = pl.multiple_of((base // whalf) % 2 * whalf, whalf)
        cp = pltpu.make_async_copy(
            win_ref.at[pl.ds(half_off, whalf), :],
            out_ref.at[pl.ds(b * hwr + base, whalf), :],
            sem)
        cp.start()
        cp.wait()
        win_ref[pl.ds(half_off, whalf), :] = jnp.zeros(
            (whalf, cpr * c), jnp.float32)
        return base + whalf

    # Per-chunk round: read-accumulate this chunk's pillars with
    # row < hi_bound into the full open window — those rows may already
    # hold earlier chunks' contributions, so this round must read-add.
    # UNGATED: an any-hit pl.when here (and on the steady rounds below)
    # measured WORSE — 8.99 vs 8.19 ms b8 r128/w400 — branches break the
    # VLIW schedule and real rounds almost always have hits.
    win_base = carry_ref[0]
    sel0 = valid & (row < win_base + wrows)
    one_hot0 = ((row % wrows == row_iota) & sel0).astype(jnp.bfloat16)
    acc0 = win_ref[:]
    for y in pieces:
        acc0 = acc0 + jax.lax.dot_general(
            one_hot0, y, contract0, preferred_element_type=jnp.float32)
    win_ref[:] = acc0

    def body_overwrite(state):
        """Steady-state round: drain half (wb//whalf)%2 (rows
        [wb, wb+whalf) are closed), then OVERWRITE it with the pillars of
        rows [ab, ab+whalf) — a virgin range (every add so far covered
        rows < ab) that maps exactly onto the drained half's slots. The
        overwrite needs no window read, no zero-store, and a half-window
        one-hot/matmul; empty ranges (pillar-id gaps) write zeros through
        the same unconditional matmul. MEASURED: an exact tie with the
        read-add formulation (same-process A/B/A 2026-08-19, b8 r128/w400:
        ra 8.36/7.94 vs ow 7.65/8.64 ms — means 8.15 both, noise ±0.9;
        w200 worse for both). Kept non-default; the matmul savings are
        real but the kernel is bound elsewhere (per-round fixed costs)."""
        wb, ab = state
        base = pl.multiple_of(wb, whalf)
        hoff = pl.multiple_of((base // whalf) % 2 * whalf, whalf)
        cp = pltpu.make_async_copy(
            win_ref.at[pl.ds(hoff, whalf), :],
            out_ref.at[pl.ds(b * hwr + base, whalf), :],
            sem)
        cp.start()
        sel = valid & (row >= ab) & (row < ab + whalf)
        one_hot = ((row % whalf == half_iota) & sel).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            one_hot, pieces[0], contract0,
            preferred_element_type=jnp.float32)
        for y in pieces[1:]:
            acc = acc + jax.lax.dot_general(
                one_hot, y, contract0, preferred_element_type=jnp.float32)
        cp.wait()
        win_ref[pl.ds(hoff, whalf), :] = acc
        return wb + whalf, ab + whalf

    def body_readadd(state):
        """Steady-state round, original formulation: zeroing flush, then a
        full-window read-add of the newly exposed rows [ab, wb+wrows)."""
        wb, ab = state
        wb = flush(wb)
        sel = valid & (row >= ab) & (row < wb + wrows)
        one_hot = ((row % wrows == row_iota) & sel).astype(jnp.bfloat16)
        acc = win_ref[:]
        for y in pieces:
            acc = acc + jax.lax.dot_general(
                one_hot, y, contract0, preferred_element_type=jnp.float32)
        win_ref[:] = acc
        return wb, wb + wrows

    body = body_overwrite if steady_overwrite else body_readadd

    win_base, _ = jax.lax.while_loop(
        lambda s: max_row >= s[0] + wrows, body,
        (win_base, win_base + wrows))

    @pl.when(j == n_chunks - 1)
    def _():
        carry_ref[0] = jax.lax.while_loop(
            lambda base: base < hwr, flush, win_base)

    @pl.when(j < n_chunks - 1)
    def _():
        carry_ref[0] = win_base


@functools.partial(jax.jit, static_argnames=("config", "interpret", "whalf",
                                             "rchunk", "steady_overwrite"))
def scatter_to_bev_ring(pillar_features, pid_per, pillar_mask,
                        config: PillarsConfig, interpret: bool | None = None,
                        whalf: int | None = None,
                        rchunk: int = _RCHUNK,
                        steady_overwrite: bool = False):
    """Streaming ring variant of scatter_to_bev_emit — same contract.

    whalf/rchunk are tuning knobs (flush half-window rows / pillars per
    grid step). The defaults are the measured optimum at the full
    operating point (2026-08-19 sweep, b8 standalone chained loop, 11k
    pillars: r128/w400 7.75 ms, r128/w640 7.82, r64/w320 8.30, r256/w1000
    8.88 (the old default), r256/w1600 9.02; the 2026-08-18 sweep also
    measured r512 11.03 and r1024 VMEM-OOM — per-round cost scales with
    rchunk x window rows; paired alternating repeats 2026-08-19: w400 vs
    w800 is an exact tie, median delta -0.03 ms over 5 pairs, so the
    400-row basin stands). whalf=None picks the divisor of H*W/cpr
    closest to the measured 400-row optimum; it must divide H*W/cpr and
    be a multiple of 8."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = config.grid_h, config.grid_w
    B, P, C = pillar_features.shape
    HW = H * W
    cpr = 128 // C
    hwr = HW // cpr
    if whalf is None:
        cands = [r for r in range(8, 2049, 8) if hwr % r == 0]
        whalf = (min(cands, key=lambda r: (abs(r - 400), -r))
                 if cands else 0)
    assert whalf % 8 == 0 and hwr % max(whalf, 1) == 0, (whalf, hwr)
    # flush invariant: each add round covers exactly the open window
    # [win_base, win_base + 2*whalf) and halves flush only once every row
    # below them is closed, so distinct unflushed rows never share a ring
    # slot. That needs a non-degenerate window; geometries where no
    # multiple of 8 divides hwr must use the XLA scatter (auto does this).
    assert whalf > 0, (
        f"scatter_to_bev_ring needs a window half-size dividing "
        f"H*W/cpr={hwr}; use scatter_to_bev for this geometry")

    p_pad = ((P + rchunk - 1) // rchunk) * rchunk
    pid_eff = jnp.where(pillar_mask, pid_per, HW)
    feats = pillar_features.astype(jnp.float32)
    if p_pad != P:
        feats = jnp.concatenate(
            [feats, jnp.zeros((B, p_pad - P, C), jnp.float32)], axis=1)
        pid_eff = jnp.concatenate(
            [pid_eff, jnp.full((B, p_pad - P), HW, pid_eff.dtype)], axis=1)
    n_chunks = p_pad // rchunk
    pid8 = jnp.broadcast_to(
        pid_eff.astype(jnp.float32).reshape(B * p_pad, 1), (B * p_pad, 8))

    out = pl.pallas_call(
        functools.partial(_bev_ring_kernel, c=C, cpr=cpr, whalf=whalf,
                          hwr=hwr, n_chunks=n_chunks, rchunk=rchunk,
                          steady_overwrite=steady_overwrite),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((rchunk, C), lambda b, j: (b * n_chunks + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rchunk, 8), lambda b, j: (b * n_chunks + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B * hwr, cpr * C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * whalf, 128), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(feats.reshape(B * p_pad, C), pid8)
    return out.reshape(B, H, W, C)
