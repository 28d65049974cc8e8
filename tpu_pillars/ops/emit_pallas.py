"""Pallas window-emit pillarizer: sort, then build the (P, N, F) pillar table
at DMA speed instead of XLA-scatter speed.

Profiling the round-1 pillarizer (ops/voxelize.py pillarize_batch) on v5e
showed the argsort everyone blamed costs 3.6 ms while the THREE XLA scatters
that follow it cost ~38 ms (point scatter 24, mask 4, pillar table 10) — XLA
lowers a scatter to ~45 cycles per index on TPU regardless of how contiguous
the destinations are. But after the sort the destinations are not just
contiguous-ish, they are MONOTONE: sorted points fill table rows
(pillar_ordinal * N + rank) in increasing order. This kernel exploits that:

  * grid = (B, M/K), sequential; each step consumes one K-point chunk of one
    sample's sorted-by-pillar-id stream (the sort is per sample, so no chunk
    ever straddles a sample boundary);
  * segment structure (rank within pillar, per-sample pillar ordinal) is
    computed in-register from the gid vector — a (K, K) equality triangle
    for ranks, a triangular matmul for the ordinal cumsum — with three SMEM
    scalars carrying the open segment across chunks;
  * each chunk expands into pillar rows of a VMEM ring window via ONE
    matmul: T = A2^T @ Y, where A2 is the one-hot of each point's window row
    (masked by validity and the pillar budget) and Y places the point's F
    raw features at lane rank*F. Summing one-hot expansions of disjoint
    points is exact — every (pillar, slot) cell receives exactly one point;
  * a second tiny matmul accumulates per-pillar metadata (kept-point count,
    pillar id) into a parallel (WROWS, 8) window;
  * whenever the OLDEST still-open pillar row moves a half-window ahead of
    the flush base, the closed half flushes to HBM with one contiguous
    async copy and is rezeroed — the table is written once, start to
    finish, with zero gaps (dropped pillars and the padded tail come out as
    the zero halves the ring pumps through them).

The wrapper reproduces ops/voxelize.py's canonical spec bit-for-bit (same
tests as the sorted and binned paths). Measured v5e, batch 4 full operating
point: see README perf notes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pillars.config import PillarsConfig
from tpu_pillars.ops.voxelize import PillarBatch, decorate

_K = 1024         # points per chunk (XLA tiles 1-D arrays at 1024 elements,
                  # so smaller chunk blocks fail Mosaic layout verification)
_WHALF = 1024     # rows per flush quantum; WROWS = 2 * _WHALF (>= _K + 1
                  # rows can open per chunk, so halves stay flushable)
_WBLK = 256       # window-row block for the one-hot matmuls: the full
                  # (K, WROWS) one-hot would cost 8 MB of VMEM; blocked
                  # matmuls keep the live set small (multisweep lanes=256
                  # ran out of scoped VMEM at block 512). For lanes == 128
                  # (single-sweep configs) block 512 FITS and measured
                  # 10.98 vs 12.83 ms (b8 chained loop, 2026-08-19 sweep;
                  # block 128: 17.25, block 1024 also tried) — the
                  # per-block fixed cost outweighs the bigger one-hot, so
                  # _wblk_for() picks 512 when lanes allow it. CONFIRMED by
                  # paired alternating repeats (probe_knob_repeats.py,
                  # 2026-08-19): 512 won all 5 pairs, median -2.04 ms; a
                  # single drifted sweep process had read the reverse.
                  # k=2048/4096 variants fail to compile (tpu_compile_helper
                  # crash) — k is pinned at 1024
_META = 8         # metadata ROWS (count, pillar_id, 6 spare): the meta
                  # window is (8, WROWS) — pillars ride the lane axis, so
                  # its matmul is a skinny (8, K) @ (K, WBLK) at ~1/64 the
                  # cost of the feature expansion, and DMA slices stay
                  # tile-aligned in both dims

# Ring no-collision invariant: a chunk of _K points can open at most _K + 1
# consecutive window rows, and a half only flushes once every row below it
# is closed, so unflushed rows span < _WHALF + _K. Distinct unflushed rows
# map to distinct ring slots iff that span <= 2 * _WHALF, i.e. _K <= _WHALF.
# Retuning _K upward without growing _WHALF would silently corrupt the
# pillar table — keep this assert.
assert _K <= _WHALF, "emit ring flush invariant requires _K <= _WHALF"
assert _WHALF % _WBLK == 0 and _K % _WBLK == 0


def _wblk_for(n_pts: int, n_f: int, k: int, whalf: int) -> int:
    """Measured-best window block for a geometry: 512 when the payload lane
    width is one tile (scoped-VMEM headroom exists; 10.98 vs 12.83 ms at
    b8), the conservative 256 for wider payloads (multisweep lanes=256
    exceeded scoped VMEM at 512)."""
    lanes = max(128, ((n_pts * n_f + 127) // 128) * 128)
    w = 512 if lanes <= 128 else 256
    while whalf % w or k % w:
        w //= 2
    return max(w, 8)


def _split3(x):
    """f32 -> three bf16 parts whose f32 sum reconstructs x EXACTLY.

    hi/mid/lo carry mantissa bits [23:16], [15:8], [7:0]; each residual is
    exact by Sterbenz. TPU dot_general at default precision runs f32 inputs
    through ONE bf16 pass (silently quantizing the payload — observed before
    this split was added); three bf16 matmuls against an exactly-bf16 0/1
    one-hot reproduce the f32 matmul bit-for-bit here because every output
    cell receives exactly one point (no accumulation-order effects), at full
    bf16 MXU rate instead of the 6-pass HIGHEST fallback.
    """
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _emit_kernel(gid_ref, pts_ref, table_ref, meta_ref, win_ref, mwin_ref,
                 carry_ref, sem, *, n_pts: int, n_f: int, p_budget: int,
                 p_pad: int, hw: int, k: int = _K, whalf: int = _WHALF,
                 wblk: int = _WBLK, gate_dead: bool = True):
    """One grid step = one K-point sorted chunk of sample b.

    carry_ref (SMEM int32): [0] gid of the open (trailing) segment,
    [1] points seen so far in that segment, [2] its pillar ordinal + 1
    (== segments seen so far this sample), [3] window flush base row.

    gate_dead skips the whole expensive middle (rank triangle, payload
    expansion, window matmul loop, carry update) for ALL-SENTINEL chunks:
    invalid points sort to the tail of each sample's stream, so once a
    chunk is dead every later chunk of that sample is too, and the stale
    carries are never read again (the drain only needs carry[3], which the
    gated region does not touch). Point buffers are statically padded
    (131072 for ~100k live points at the full operating point), so the
    tail is ~20-25% of chunks on dense sweeps and far more on sparse ones.
    """
    b = pl.program_id(0)
    j = pl.program_id(1)
    last = pl.num_programs(1) - 1
    wrows = 2 * whalf
    lanes = max(128, ((n_pts * n_f + 127) // 128) * 128)

    @pl.when(j == 0)
    def _():
        win_ref[:] = jnp.zeros((wrows, lanes), jnp.float32)
        mwin_ref[:] = jnp.zeros((_META, wrows), jnp.float32)
        carry_ref[0] = -1
        carry_ref[1] = 0
        carry_ref[2] = 0
        carry_ref[3] = 0

    carry_gid = carry_ref[0]
    carry_run = carry_ref[1]
    carry_ord = carry_ref[2]

    gv = gid_ref[:]                                           # (K,) int32
    g = gv.reshape(k, 1)                                      # (K, 1)
    valid = g < hw

    # segment starts: gid differs from the previous point's gid
    prev = pltpu.roll(g, shift=1, axis=0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    prev = jnp.where(row_iota == 0, carry_gid, prev)
    first = valid & (g != prev)

    def _chunk_body():
        # rank within segment: in-chunk equality triangle + cross-chunk
        # carry. The (K, K) triangle is computed in (K, wblk) column blocks
        # to bound live vregs; both reductions are exact f32 integer sums.
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, wblk), 0)
        excl = jnp.zeros((k, 1), jnp.float32)
        cum_first = jnp.zeros((k, 1), jnp.float32)
        first_f = first.astype(jnp.float32)
        for cb in range(k // wblk):
            col_ids = (jax.lax.broadcasted_iota(jnp.int32, (k, wblk), 1)
                       + cb * wblk)
            # row vector of this column block, broadcast along sublanes (a
            # reshape-to-(1,K) would be a Mosaic transpose — unsupported)
            g_blk = jax.lax.broadcast_in_dim(
                gv[cb * wblk:(cb + 1) * wblk], (k, wblk), (1,))
            eq_blk = g == g_blk
            excl_new = excl + jnp.sum(
                (eq_blk & (row_ids > col_ids)).astype(jnp.float32),
                axis=1, keepdims=True)
            excl = excl_new
            # inclusive cumsum of `first` via a blocked triangular matmul:
            # cum_first_i += sum_{j in block, j <= i} first_j
            tri_blk = (col_ids <= row_ids).astype(jnp.float32)  # (K, wblk)
            cum_first = cum_first + jax.lax.dot_general(
                tri_blk, first_f[cb * wblk:(cb + 1) * wblk, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        cont = (g == carry_gid).astype(jnp.int32)
        rank = excl.astype(jnp.int32) + cont * carry_run

        ordinal = carry_ord + cum_first.astype(jnp.int32) - 1
        # continuing points (first=0, cum=0 prefix) resolve to carry_ord - 1
        # == the open segment's ordinal; the -1 offset is exactly the spec's
        # 0-based pillar ordinal.

        # ring slot is a FIXED function of the row (ordinal mod WROWS) so it
        # stays consistent with the flush, which drains half
        # [base//WHALF % 2]; the flush invariant (open rows span
        # < WHALF + K <= WROWS) rules out slot collisions between unflushed
        # rows
        off = ordinal % wrows
        keep = valid & (ordinal < p_budget)

        # split the raw payload into exact bf16 parts FIRST, then
        # lane-expand each part: the (K, lanes) f32 expansion and its split
        # residuals never exist, which keeps multisweep configs (lanes=256)
        # inside scoped VMEM. The expansion Y[p, l] = part[p, l % F] for
        # l // F == rank_p is built as ONE tiny tile matmul (part @ T with
        # T[f, l] = [l % F == f], each output cell exactly one product ->
        # exact) plus ONE shared segment compare and one select per part —
        # the old per-(part, f) select chain cost 12 (K, lanes) compare+
        # select pairs per chunk where this costs 1 compare + 3 selects
        # (selects run in f32 with the i32-compare mask: the v5e VPU has
        # neither 16-bit iota nor 16-bit compares, and an i32 mask cannot
        # relayout into a bf16 select).
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (k, lanes), 1)
        hit = (lane_iota // n_f) == rank                  # (K, lanes)
        t_rows = jax.lax.broadcasted_iota(jnp.int32, (n_f, lanes), 0)
        t_cols = jax.lax.broadcasted_iota(jnp.int32, (n_f, lanes), 1)
        tile_t = (t_cols % n_f == t_rows).astype(jnp.bfloat16)
        y_parts = []
        for part in _split3(pts_ref[:]):
            tiled = jax.lax.dot_general(
                part, tile_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (K, lanes) exact
            y_parts.append(jnp.where(hit, tiled, 0.0).astype(jnp.bfloat16))

        # metadata payload, one column stack -> ONE skinny matmul per hit
        # block: col 0 = kept indicator (count), cols 1-3 = pillar id (3-way
        # bf16 split, emitted at the segment's first point), cols 4-12 =
        # kept-masked x, y, z (3 parts each — their window sums are the
        # pillar coordinate sums the fused decoration-free PFN consumes),
        # cols 13-15 = zero pad.
        kept_cnt = (rank < n_pts).astype(jnp.bfloat16)        # (K, 1) exact
        kept_f = (rank < n_pts).astype(jnp.float32)
        pid_first = first.astype(jnp.float32) * g.astype(jnp.float32)
        meta_cols = [kept_cnt]
        meta_cols += list(_split3(pid_first))
        for fcol in range(3):
            meta_cols += list(_split3(pts_ref[:, fcol:fcol + 1] * kept_f))
        meta_payload = jnp.concatenate(
            meta_cols + [jnp.zeros((k, 3), jnp.bfloat16)], axis=1)  # (K, 16)

        # one-hot expand into the ring window, blocked over window rows:
        # each block builds its (K, WBLK) slice of the one-hot and feeds the
        # feature expansion plus two skinny column-contracted metadata
        # products (both contract over K on dim 0 — no transposes, which
        # Mosaic lacks). A chunk's kept rows span at most K+1 consecutive
        # window rows, so most chunks touch ~2 of the 4 blocks — blocks
        # with no hits skip their matmuls and window read-modify-writes
        # entirely.
        blk_iota = jax.lax.broadcasted_iota(jnp.int32, (k, wblk), 1)
        contract0 = (((0,), (0,)), ((), ()))
        for wb in range(wrows // wblk):
            in_blk = keep & (off >= wb * wblk) & (off < (wb + 1) * wblk)
            any_hit = jnp.any(in_blk)

            @pl.when(any_hit)
            def _(wb=wb, in_blk=in_blk):
                a_blk = ((off == blk_iota + wb * wblk)
                         & in_blk).astype(jnp.bfloat16)
                t = sum(jax.lax.dot_general(
                            a_blk, part, contract0,
                            preferred_element_type=jnp.float32)
                        for part in y_parts)
                win_ref[wb * wblk:(wb + 1) * wblk, :] = (
                    win_ref[wb * wblk:(wb + 1) * wblk, :] + t)
                res = jax.lax.dot_general(meta_payload, a_blk, contract0,
                                          preferred_element_type=jnp.float32)
                sl = slice(wb * wblk, (wb + 1) * wblk)
                mwin_ref[0:1, sl] = mwin_ref[0:1, sl] + res[0:1]
                mwin_ref[1:2, sl] = (mwin_ref[1:2, sl]
                                     + res[1:2] + res[2:3] + res[3:4])
                mwin_ref[2:3, sl] = (mwin_ref[2:3, sl]
                                     + res[4:5] + res[5:6] + res[6:7])
                mwin_ref[3:4, sl] = (mwin_ref[3:4, sl]
                                     + res[7:8] + res[8:9] + res[9:10])
                mwin_ref[4:5, sl] = (mwin_ref[4:5, sl]
                                     + res[10:11] + res[11:12] + res[12:13])

        # update carries from the chunk tail
        new_ord = carry_ord + cum_first[k - 1, 0].astype(jnp.int32)
        carry_ref[0] = g[k - 1, 0]
        carry_ref[1] = rank[k - 1, 0] + 1
        carry_ref[2] = new_ord

    if gate_dead:
        # all-sentinel chunks (the sorted stream's padded tail) skip the
        # whole middle; their carries go stale but are never read again
        # (every later chunk of the sample is dead too, and the drain only
        # needs carry[3], untouched here)
        pl.when(jnp.any(valid))(_chunk_body)
    else:
        _chunk_body()

    win_base = carry_ref[3]
    # rows < open are closed; re-read the ordinal carry AFTER the (possibly
    # predicated) chunk body so dead chunks see the last live value
    open_row_carry = carry_ref[2]

    def flush(base):
        base = pl.multiple_of(base, whalf)
        half = (base // whalf) % 2
        hoff = pl.multiple_of(half * whalf, whalf)
        src = win_ref.at[pl.ds(hoff, whalf), :]
        msrc = mwin_ref.at[:, pl.ds(hoff, whalf)]
        cp1 = pltpu.make_async_copy(
            src, table_ref.at[pl.ds(b * p_pad + base, whalf), :], sem.at[0])
        cp2 = pltpu.make_async_copy(
            msrc, meta_ref.at[pl.ds(b * _META, _META), pl.ds(base, whalf)],
            sem.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        win_ref[pl.ds(half * whalf, whalf), :] = jnp.zeros(
            (whalf, lanes), jnp.float32)
        mwin_ref[:, pl.ds(half * whalf, whalf)] = jnp.zeros(
            (_META, whalf), jnp.float32)
        return base + whalf

    # the open row (ordinal carry - 1) may still grow next chunk, so it
    # never flushes before the drain
    open_row = jnp.minimum(open_row_carry - 1, p_budget)

    @pl.when(j < last)
    def _():
        carry_ref[3] = jax.lax.while_loop(
            lambda base: open_row - base >= whalf, flush, win_base)

    @pl.when(j == last)
    def _():
        carry_ref[3] = jax.lax.while_loop(
            lambda base: base < p_pad, flush, win_base)


def emit_table_flat(gid_sorted, pts_sorted, n_pts: int, n_f: int,
                    p_budget: int, hw: int, interpret: bool | None = None,
                    k: int = _K, whalf: int = _WHALF, wblk: int | None = None,
                    gate_dead: bool = True):
    """Raw kernel outputs, un-reshaped:
      table (B*P_pad, lanes) f32 — row r = pillar r's points at lanes
        rank*n_f + f (lanes = n_pts*n_f padded to a 128 multiple);
      meta  (B*8, P_pad) f32 — rows per sample: 0 kept-point count,
        1 pillar id, 2-4 kept-point x/y/z sums, 5-7 spare.
    The fused decoration-free PFN (ops/fused_pfn.py) consumes these
    directly; emit_pillar_table reshapes them into the padded table view.

    k/whalf/wblk are static tuning knobs (points per grid step / flush
    half-window rows / window-block columns for the one-hot matmuls); the
    defaults are the measured optimum — sweep numbers in the probe script
    and docs/PERF.md.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if wblk is None:
        wblk = _wblk_for(n_pts, n_f, k, whalf)
    assert k % 1024 == 0, "1-D gid blocks must be 1024-multiples (Mosaic)"
    assert k <= whalf, "emit ring flush invariant requires k <= whalf"
    assert whalf % wblk == 0 and k % wblk == 0
    b, m = gid_sorted.shape
    m_pad = ((m + k - 1) // k) * k
    if m_pad != m:
        pad = jnp.full((b, m_pad - m), hw, jnp.int32)
        gid_sorted = jnp.concatenate([gid_sorted, pad], axis=1)
        pts_sorted = jnp.concatenate(
            [pts_sorted, jnp.zeros((b, m_pad - m, n_f), pts_sorted.dtype)],
            axis=1)
    p_pad = ((p_budget + whalf - 1) // whalf) * whalf
    n_chunks = m_pad // k
    # lane dim padded to a full 128 tile so ring-window DMA slices stay
    # aligned (tiny configs have n_pts * n_f < 128)
    lanes = max(128, ((n_pts * n_f + 127) // 128) * 128)

    table, meta = pl.pallas_call(
        functools.partial(_emit_kernel, n_pts=n_pts, n_f=n_f,
                          p_budget=p_budget, p_pad=p_pad, hw=hw,
                          k=k, whalf=whalf, wblk=wblk, gate_dead=gate_dead),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((k,), lambda i, j: (i * n_chunks + j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n_f), lambda i, j: (i * n_chunks + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * p_pad, lanes), jnp.float32),
            jax.ShapeDtypeStruct((b * _META, p_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * whalf, lanes), jnp.float32),
            pltpu.VMEM((_META, 2 * whalf), jnp.float32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(gid_sorted.reshape(-1).astype(jnp.int32),
      pts_sorted.reshape(b * m_pad, n_f).astype(jnp.float32))
    return table, meta


@functools.partial(
    jax.jit, static_argnames=("n_pts", "n_f", "p_budget", "hw", "interpret",
                              "k", "whalf", "wblk", "gate_dead"))
def emit_pillar_table(gid_sorted, pts_sorted, n_pts: int, n_f: int,
                      p_budget: int, hw: int, interpret: bool | None = None,
                      k: int = _K, whalf: int = _WHALF,
                      wblk: int | None = None, gate_dead: bool = True):
    """gid_sorted (B, M) int32 ascending per sample (hw == invalid sentinel),
    pts_sorted (B, M, F) the matching payload ->
      table (B, P_pad, n_pts, n_f) f32  (P_pad = P rounded up to whalf)
      meta  (B, 8, P_pad) f32: row 0 = kept-point count, row 1 = pillar id,
      rows 2-4 = kept-point x/y/z sums.
    """
    b = gid_sorted.shape[0]
    table, meta = emit_table_flat(gid_sorted, pts_sorted, n_pts, n_f,
                                  p_budget, hw, interpret=interpret,
                                  k=k, whalf=whalf, wblk=wblk,
                                  gate_dead=gate_dead)
    p_pad = meta.shape[1]
    table = table[:, : n_pts * n_f]
    return (table.reshape(b, p_pad, n_pts, n_f),
            meta.reshape(b, _META, p_pad))


def pillarize_auto(points, num_points, config: PillarsConfig) -> PillarBatch:
    """Single-sweep pillarization via the best path for the active backend:
    the window-emit kernel on TPU (39.5 -> 13.2 ms at batch-4 full size, so
    ~3x for one sweep too), the XLA sort path elsewhere (the interpret-mode
    kernel is correct but slow on CPU)."""
    from tpu_pillars.ops.voxelize import pillarize

    if jax.default_backend() != "tpu":
        return pillarize(points, num_points, config)
    n = jnp.asarray(num_points, jnp.int32)
    if n.ndim == 0:
        n = n[None]
    batch = pillarize_batch_emit(points[None], n, config)
    return PillarBatch(*(x[0] for x in batch))


def pillarize_batch_auto(points, num_points,
                         config: PillarsConfig) -> PillarBatch:
    """Batched pillarization via the best path for the active backend (see
    pillarize_auto). Semantics identical either way — tests pin the emit
    kernel bit-for-bit against pillarize_batch."""
    from tpu_pillars.ops.voxelize import pillarize_batch

    if jax.default_backend() != "tpu":
        return pillarize_batch(points, num_points, config)
    return pillarize_batch_emit(points, num_points, config)


def sort_points_by_pillar(points, num_points, config: PillarsConfig):
    """(B, M, F) points -> (gid_sorted (B, M) int32 ascending per sample
    with H*W as the invalid sentinel, pts_sorted (B, M, F)).

    One stable per-sample multi-operand sort carrying the payload through
    the comparator network (beats argsort + a separate 524k-row gather on
    v5e). The shared front half of every emit-kernel consumer.

    Alternatives measured and rejected (scripts/probe_sort_ab.py, v5e b8
    full config 2026-08-20): is_stable=False with iota as an explicit
    second key (bit-equal by uniqueness) 8.7 ms vs 3.6 here — XLA's
    internal stability augmentation is CHEAPER than an explicit 2-key
    comparator; keys+iota sort then take_along_axis payload gather adds
    ~7 ms; the VMEM-resident Pallas bitonic network (ops/sort_pallas.py)
    loses ~2x (numbers in its docstring).
    """
    W, H = config.grid_w, config.grid_h
    B, M, F = points.shape
    HW = H * W

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
    pid = jnp.where(valid, row * W + col, HW)

    operands = [pid] + [points[..., f] for f in range(F)]
    sorted_ops = jax.lax.sort(operands, dimension=-1, is_stable=True,
                              num_keys=1)
    return sorted_ops[0], jnp.stack(sorted_ops[1:], axis=-1)


def pillarize_batch_emit(points, num_points, config: PillarsConfig,
                         interpret: bool | None = None) -> PillarBatch:
    """Drop-in for ``pillarize_batch`` built on the window-emit kernel:
    identical canonical semantics (ops/voxelize.py docstring), bit-identical
    PillarBatch fields. One per-sample multi-operand sort replaces the
    argsort + payload gather; the kernel replaces every scatter.
    """
    P = config.max_pillars
    N = config.max_points_per_pillar
    W, H = config.grid_w, config.grid_h
    B, M, F = points.shape
    HW = H * W

    gid_s, pts_s = sort_points_by_pillar(points, num_points, config)
    table, meta = emit_pillar_table(gid_s, pts_s, N, F, P, HW,
                                    interpret=interpret)
    raw = table[:, :P]                                        # (B, P, N, F)
    cnt = meta[:, 0, :P]
    pid_per = meta[:, 1, :P].astype(jnp.int32)

    pillar_mask = cnt > 0.0
    mask = (jnp.arange(N, dtype=jnp.int32)[None, None, :]
            < cnt.astype(jnp.int32)[:, :, None])
    coords = jnp.stack([pid_per // W, pid_per % W], axis=-1) \
        * pillar_mask[..., None]

    features = decorate(raw, mask, coords, config)
    return PillarBatch(features, mask, coords, pillar_mask)
