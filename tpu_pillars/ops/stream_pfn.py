"""Table-free streaming serving front end: sorted points -> BEV canvas in
ONE Pallas kernel (embed + segmented reduce + ring-window scatter).

The fused front end (ops/fused_pfn.py) already removed the decorated
(B, P, N, 9) tensor, but it still materializes the emit kernel's flat
pillar TABLE (rows, N*F) — whose construction is the single most expensive
placement in the pipeline: the emit kernel one-hot-matmuls every point into
its (pillar row, slot) cell (~6.5 ms of the 34 ms batch-8 serving step),
the fused PFN re-reads the table (~0.6 ms), and the ring BEV scatter then
places the per-pillar features again (~7.9 ms). Three placements of the
same sorted stream.

This kernel observes that the table exists only to group each pillar's
points for ONE masked max (and three coordinate sums) — and after the sort
those groups are CONTIGUOUS RUNS bounded by the kept-points cap: the
canonical spec keeps only the first N points of each pillar, so every
value that can influence pillar p lives within N positions of p's run
start. A prefix-doubling ladder of guarded circular rolls therefore
reduces every run in log2(N) register passes, with NO pillar table, no
second kernel, and no per-pillar re-placement:

  * XLA pre-pass (cheap (B, M) integer ops on the sorted gid stream):
    `kept_j  = valid_j and gid[j-N] != gid[j]`   (ONE shifted compare —
    the emit kernel's (K, K) rank triangle collapses to this because only
    rank < N matters), `start_j = gid[j] != gid[j-1]`, and the pillar
    budget mask via one cumsum of `start`.
  * kernel, grid (B, M/CK) sequential over point chunks; each step stages
    its chunk plus the next (a run starting in chunk j ends within
    next_pow2(N) <= CK rows, so the 2-chunk view always contains every
    kept point of every run that STARTS in chunk j — no cross-chunk carry
    at all, unlike the emit kernel's SMEM segment carries):
      - embed: (2CK, 8) @ (8, C) MXU pass — W_eff from
        fold_decoration (ops/fused_pfn.py), payload CELL-CENTERED for the
        same bf16-quantization reason as the fused path;
      - ladder: for s in (1, 2, 4, ... < next_pow2(N)):
        u = max(u, same_run_shifted(u, s)), st = st + same_run_shifted(st)
        — guarded prefix doubling; at a run's first row u holds the masked
        max over its kept points and st the kept-point x/y/z sums + count;
      - per-run epilogue at run-start rows: decoration bias t from the
        sums (identical formula to ops/fused_pfn._fpfn_kernel), ReLU,
        zero elsewhere;
      - ring-window canvas accumulate: the proven scatter_to_bev_ring
        structure (half-window DMA flushes, read-add rounds), with the
        one-hot matmuls BLOCKED over window-row blocks and any-hit gated —
        a 1024-point chunk usually spans well under 100 canvas rows, so
        most blocks of the 800-row window are provably cold (the emit
        kernel measured the same gating pattern a win; the ungated ring
        kernel's chunks are 128 PILLARS, which usually hit, so it stays
        ungated — see its docstring).

Semantics: canvas == relu(masked-max(W_eff r') + t) per occupied cell,
zeros elsewhere — the same algebra as pillarize_pfn_fused +
scatter_to_bev_ring with a different reduction ORDER for the coordinate
sums (ladder tree vs the emit kernel's exact one-hot sums), so parity vs
the fused path is pinned to tolerance, not bit-equality, in
tests/test_stream_pfn.py. Inference only: training keeps the table front
end (its BN sufficient statistics genuinely need the table, and the train
emit cost is ~0.4 ms after the dead-chunk gate).

Status: MEASURED AND PARKED (non-default), 2026-08-19, v5e, batch-8 full
config, same-process A/B/A (scripts/probe_stream_pfn.py,
probe_stream_lad.py, probe_stream_split.py):

    points -> canvas: fused-table path 17.4-17.9 ms; stream kernel
    22.9-23.5 ms (fwd1 ladder; correctness confirmed on-chip: max abs
    diff 1.5e-5 on a 122-max canvas, ZERO occupancy mismatches).
    Split: sort+center 1.9, sidecar+kernel 20.8. The ladder is NOT the
    cost (lad_mode="off" still 21.4); neither is the budget cumsum.
    The cost is intrinsic: every placement op (one-hot builds, lane-
    group pieces, gated window matmuls) scales with the k=1024 POINT
    rows per chunk, ~8x the ring kernel's 128 PILLAR rows — and the
    ~90% non-run-start rows cannot be compacted away without a
    data-dependent gather or a static runs-per-chunk bound that
    adversarial inputs (one point per pillar) violate. Knobs don't
    move it: whalf 200/400/800 within noise, wblk 400 22.1, block
    gating on/off tie, ck=2048 crashes the compile helper (same as the
    emit kernel's k=2048). The same lesson as the parked binning
    pillarizer and block-gather scatter: XLA-visible structure
    (sort + window emit + pillar-level ring scatter) beats a denser
    single kernel when the dense kernel must pay per-point placement.

The kernel stays fully tested (tests/test_stream_pfn.py pins parity vs
the fused-table oracle, budget overflow, empty samples, multisweep, and
bit-equality across every knob) as the measured record and as a second
independent implementation of the canonical reduction semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pillars.config import PillarsConfig
from tpu_pillars.ops.emit_pallas import _split3, sort_points_by_pillar
from tpu_pillars.ops.fused_pfn import fold_decoration

_CK = 1024        # points per grid step


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pick_whalf(hwr: int) -> int:
    """Divisor of hwr nearest the ring kernel's measured 400-row basin."""
    cands = [r for r in range(8, 2049, 8) if hwr % r == 0]
    return min(cands, key=lambda r: (abs(r - 400), -r)) if cands else 0


def _pick_wblk(wrows: int) -> int:
    """Largest multiple of 8 dividing wrows, capped at 256 (the any-hit
    blocks want to be small enough that a chunk's typical <100-row span
    leaves most of them cold)."""
    best = 8
    for wbk in range(8, 257, 8):
        if wrows % wbk == 0:
            best = wbk
    return best


def _stream_kernel(ptsA, ptsB, sdA, sdB, weff_ref, wdec_ref, out_ref,
                   win_ref, carry_ref, sem, *, c: int, cpr: int, whalf: int,
                   hwr: int, hw: int, n_chunks: int, ck: int, n_lad: int,
                   wblk: int, w_grid: int, x_min: float, y_min: float,
                   vx: float, vy: float, gate_dead: bool, gate_blocks: bool,
                   lad_mode: str = "fwd1"):
    b = pl.program_id(0)
    j = pl.program_id(1)
    wrows = 2 * whalf
    k2 = 2 * ck

    @pl.when(j == 0)
    def _():
        win_ref[:] = jnp.zeros((wrows, cpr * c), jnp.float32)
        carry_ref[0] = 0

    sd1 = sdA[:]                                          # (CK, 8)
    gid1 = sd1[:, 0:1].astype(jnp.int32)                  # (CK, 1)

    # run-start rows of THIS chunk (B-half rows emit when their chunk is
    # the A half); the sidecar's start flag already folds in validity and
    # the pillar budget
    start_ok = sd1[:, 2:3] > 0.0
    rowi = jnp.where(start_ok, gid1 // cpr, hwr)          # canvas row
    lane_g = gid1 - rowi * cpr
    max_row = jnp.max(jnp.where(start_ok, rowi, -1))

    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (ck, wblk), 1)
    contract0 = (((0,), (0,)), ((), ()))

    def _chunk_body():
        pts = jnp.concatenate([ptsA[:], ptsB[:]], axis=0)  # (2CK, 8)
        sd = jnp.concatenate([sd1, sdB[:]], axis=0)        # (2CK, 8)
        gidf = sd[:, 0:1]                                  # f32, exact
        kept = sd[:, 1:2] > 0.0

        # per-point pre-activation (one bf16 MXU pass over CELL-CENTERED
        # payload — the fused front end's accepted precision class)
        u = jax.lax.dot_general(pts, weff_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = jnp.where(kept, u, -1e9)                       # (2CK, C)
        st = jnp.where(
            kept,
            jnp.concatenate(
                [pts[:, 0:3], jnp.ones((k2, 1), jnp.float32)], axis=1),
            0.0)                                           # (2CK, 4)

        # guarded prefix-doubling ladder: after step s the row at a run's
        # start holds max/sum over [start, start + 2s) ∩ run ∩ kept; kept
        # points span < n_lad rows, so log2(n_lad) steps finish every run
        if lad_mode == "fwd":
            s = 1
            while s < n_lad:
                sh = k2 - s                                # roll j+s -> j
                same = pltpu.roll(gidf, shift=sh, axis=0) == gidf
                u = jnp.maximum(
                    u,
                    jnp.where(same, pltpu.roll(u, shift=sh, axis=0), -1e9))
                st = st + jnp.where(
                    same, pltpu.roll(st, shift=sh, axis=0), 0.0)
                s *= 2
        elif lad_mode == "fwd1":
            # one roll per step: ladder the concatenated (u | st | gid)
            # payload, split after the roll (3x fewer sublane rolls)
            pay = jnp.concatenate(
                [u, st, gidf,
                 jnp.zeros((k2, 128 - c - 5), jnp.float32)], axis=1)
            s = 1
            while s < n_lad:
                rolled = pltpu.roll(pay, shift=k2 - s, axis=0)
                same = rolled[:, c + 4:c + 5] == pay[:, c + 4:c + 5]
                merged = jnp.concatenate([
                    jnp.maximum(pay[:, :c], rolled[:, :c]),
                    pay[:, c:c + 4] + rolled[:, c:c + 4],
                ], axis=1)
                upd = jnp.where(same, merged, pay[:, :c + 4])
                pay = jnp.concatenate([upd, pay[:, c + 4:]], axis=1)
                s *= 2
            u = pay[:, :c]
            st = pay[:, c:c + 4]
        elif lad_mode == "off":       # timing-only: WRONG values
            pass
        else:
            raise ValueError(lad_mode)

        u1 = u[0:ck]                                       # (CK, C)
        st1 = st[0:ck]

        # decoration bias t (same formula as ops/fused_pfn._fpfn_kernel)
        cnt = st1[:, 3:4]
        inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
        mx = st1[:, 0:1] * inv_cnt
        my = st1[:, 1:2] * inv_cnt
        mz = st1[:, 2:3] * inv_cnt
        col = (gid1 % w_grid).astype(jnp.float32)
        row_g = (gid1 // w_grid).astype(jnp.float32)
        cx = x_min + (col + 0.5) * vx
        cy = y_min + (row_g + 0.5) * vy

        def wrow(i):
            return jax.lax.broadcast_in_dim(wdec_ref[i, :], (ck, c), (1,))

        t = (wrow(5) - mx * wrow(0) - my * wrow(1) - mz * wrow(2)
             - cx * wrow(3) - cy * wrow(4))
        val = jnp.where(start_ok, jnp.maximum(u1 + t, 0.0), 0.0)

        # lane-group placement + exact 3-way bf16 split (ring kernel form)
        pieces = []
        for part in _split3(val):
            row_parts = []
            for g in range(cpr):
                m_g = (lane_g == g).astype(jnp.bfloat16)
                row_parts.append(part * m_g)
            pieces.append(jnp.concatenate(row_parts, axis=1))  # (CK, cpr*C)

        def add_rows(sel):
            """Accumulate sel rows into their ring slots, blocked over
            window-row blocks with any-hit gating (most blocks are cold
            for a typical chunk's narrow canvas-row span)."""
            slot = rowi % wrows
            for wb in range(wrows // wblk):
                in_blk = sel & (slot >= wb * wblk) & (slot < (wb + 1) * wblk)

                def _add(wb=wb, in_blk=in_blk):
                    one_hot = ((slot == blk_iota + wb * wblk)
                               & in_blk).astype(jnp.bfloat16)
                    acc = win_ref[wb * wblk:(wb + 1) * wblk, :]
                    for y in pieces:
                        acc = acc + jax.lax.dot_general(
                            one_hot, y, contract0,
                            preferred_element_type=jnp.float32)
                    win_ref[wb * wblk:(wb + 1) * wblk, :] = acc

                if gate_blocks:
                    pl.when(jnp.any(in_blk))(_add)
                else:
                    _add()

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

        win_base = carry_ref[0]
        add_rows(start_ok & (rowi < win_base + wrows))

        def body(state):
            wb_, ab = state
            wb_ = flush(wb_)
            add_rows(start_ok & (rowi >= ab) & (rowi < wb_ + wrows))
            return wb_, wb_ + wrows

        win_base, _ = jax.lax.while_loop(
            lambda s_: max_row >= s_[0] + wrows, body,
            (win_base, win_base + wrows))
        carry_ref[0] = win_base

    if gate_dead:
        # all-sentinel chunks (the sorted tail) place nothing and never
        # advance the window; the final drain below reads carry normally
        pl.when(jnp.any(gid1 < hw))(_chunk_body)
    else:
        _chunk_body()

    @pl.when(j == n_chunks - 1)
    def _():
        def flush_drain(base):
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

        carry_ref[0] = jax.lax.while_loop(
            lambda base: base < hwr, flush_drain, carry_ref[0])


@functools.partial(jax.jit, static_argnames=(
    "config", "interpret", "ck", "whalf", "wblk", "gate_dead",
    "gate_blocks", "lad_mode", "dbg"))
def stream_canvas_from_sorted(gid_sorted, pts_centered, w_eff, w_dec,
                              config: PillarsConfig,
                              interpret: bool | None = None,
                              ck: int = _CK, whalf: int | None = None,
                              wblk: int | None = None,
                              gate_dead: bool = True,
                              gate_blocks: bool = True,
                              lad_mode: str = "fwd1",
                              dbg: str = "none"):
    """(B, M) ascending pillar ids (H*W sentinel) + (B, M, F) CELL-CENTERED
    sorted payload + fold_decoration weights -> (B, H, W, C) f32 canvas.

    ck / whalf / wblk are static tuning knobs (points per grid step /
    flush half-window rows / any-hit block columns); outputs are invariant
    across knob settings (tests pin it)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = config.grid_h, config.grid_w
    HW = H * W
    N = config.max_points_per_pillar
    P = config.max_pillars
    B, M, F = pts_centered.shape
    C = w_eff.shape[1]
    assert 128 % C == 0, C
    cpr = 128 // C
    hwr = HW // cpr
    if whalf is None:
        whalf = _pick_whalf(hwr)
    assert whalf > 0 and whalf % 8 == 0 and hwr % whalf == 0, (whalf, hwr)
    if wblk is None:
        wblk = _pick_wblk(2 * whalf)
    assert (2 * whalf) % wblk == 0 and wblk % 8 == 0, (whalf, wblk)
    n_lad = _next_pow2(N)
    assert n_lad <= ck, (N, ck)
    assert F <= 8, F

    m_pad = ((M + ck - 1) // ck) * ck
    if m_pad != M:
        gid_sorted = jnp.concatenate(
            [gid_sorted,
             jnp.full((B, m_pad - M), HW, gid_sorted.dtype)], axis=1)
        pts_centered = jnp.concatenate(
            [pts_centered,
             jnp.zeros((B, m_pad - M, F), pts_centered.dtype)], axis=1)
    n_chunks = m_pad // ck

    # sidecar ((B, M) integer ops; the emit kernel's rank triangle collapses
    # to ONE shifted compare because only rank < N matters)
    gid = gid_sorted.astype(jnp.int32)
    valid = gid < HW
    if dbg == "stub":            # timing-only: WRONG values, no shifts/cumsum
        kept = valid
        start_ok = valid & ((gid % 8) == 0)
    else:
        prev1 = jnp.concatenate(
            [jnp.full((B, 1), -1, jnp.int32), gid[:, :-1]], axis=1)
        start = valid & (gid != prev1)
        prevN = jnp.concatenate(
            [jnp.full((B, N), -1, jnp.int32), gid[:, :-N]], axis=1)
        kept = valid & (gid != prevN)
        if dbg == "nocum":       # timing-only: no pillar-budget cumsum
            start_ok = start
        else:
            pidx = jnp.cumsum(start.astype(jnp.int32), axis=1) - 1
            start_ok = start & (pidx < P)

    side = jnp.stack([
        gid.astype(jnp.float32),          # exact: HW < 2^24 in all configs
        kept.astype(jnp.float32),
        start_ok.astype(jnp.float32),
    ], axis=-1)
    side = jnp.concatenate(
        [side, jnp.zeros((B, m_pad, 5), jnp.float32)], axis=-1)
    pts8 = jnp.concatenate(
        [pts_centered.astype(jnp.float32),
         jnp.zeros((B, m_pad, 8 - F), jnp.float32)], axis=-1)

    # one trailing sentinel chunk PER SAMPLE so the B-half staging of each
    # sample's last chunk never reads the next sample's stream
    sent_pts = jnp.zeros((B, ck, 8), jnp.float32)
    sent_side = jnp.concatenate(
        [jnp.full((B, ck, 1), float(HW), jnp.float32),
         jnp.zeros((B, ck, 7), jnp.float32)], axis=-1)
    pts8 = jnp.concatenate([pts8, sent_pts], axis=1).reshape(-1, 8)
    side = jnp.concatenate([side, sent_side], axis=1).reshape(-1, 8)
    stride = n_chunks + 1

    weff8 = jnp.concatenate(
        [w_eff.astype(jnp.float32),
         jnp.zeros((8 - F, C), jnp.float32)], axis=0)

    out = pl.pallas_call(
        functools.partial(
            _stream_kernel, c=C, cpr=cpr, whalf=whalf, hwr=hwr, hw=HW,
            n_chunks=n_chunks, ck=ck, n_lad=n_lad, wblk=wblk,
            w_grid=W, x_min=config.x_min, y_min=config.y_min,
            vx=config.voxel_x, vy=config.voxel_y,
            gate_dead=gate_dead, gate_blocks=gate_blocks,
            lad_mode=lad_mode),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((ck, 8), lambda b, j: (b * stride + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ck, 8), lambda b, j: (b * stride + j + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ck, 8), lambda b, j: (b * stride + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ck, 8), lambda b, j: (b * stride + j + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda b, j: (0, 0),
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
    )(pts8, pts8, side, side, weff8, w_dec.astype(jnp.float32))
    return out.reshape(B, H, W, C)


def points_to_canvas_stream(points, num_points, w, b,
                            config: PillarsConfig,
                            interpret: bool | None = None, **knobs):
    """The streaming serving front end: (B, M, F) raw points + folded
    decorated-space PFN weights (fold_bn output) -> (B, H, W, C) canvas.
    Drop-in for pillarize_pfn_fused + scatter_to_bev_auto_pid."""
    F = points.shape[-1]
    if F != config.num_input_features:
        raise ValueError(
            f"points have {F} features; config expects "
            f"{config.num_input_features}")
    gid_s, pts_s = sort_points_by_pillar(points, num_points, config)
    col = (gid_s % config.grid_w).astype(jnp.float32)
    row = (gid_s // config.grid_w).astype(jnp.float32)
    cx = config.x_min + (col + 0.5) * config.voxel_x
    cy = config.y_min + (row + 0.5) * config.voxel_y
    pts_c = jnp.concatenate([
        (pts_s[..., 0] - cx)[..., None],
        (pts_s[..., 1] - cy)[..., None],
        pts_s[..., 2:],
    ], axis=-1)
    w_eff, w_dec = fold_decoration(w, b, config)
    return stream_canvas_from_sorted(gid_s, pts_c, w_eff, w_dec, config,
                                     interpret=interpret, **knobs)
