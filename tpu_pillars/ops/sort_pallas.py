"""VMEM-resident bitonic sort for the emit front end's per-sample key sort.

The serving front end's last XLA-owned tier is the per-sample stable sort
of pillar ids (ops/emit_pallas.py sort_points_by_pillar): ONE
multi-operand `lax.sort` over (B, M) int32 keys carrying the F float
payload columns through the comparator network (~4.4 ms of the b8 batch
per the r2 split). XLA lowers sorts to HLO-level compare/select rounds
with HBM round trips between them; the whole working set (key + idx +
payload = 7 x 131072 x 4 B = 3.7 MB/sample) fits in VMEM, so a fused
in-register network should beat it on memory traffic alone.

Design (v5e):
  * per-sample flat index i in [0, M), M a power of two, laid out as
    (M // 128, 128) — row r = i >> 7, lane c = i & 127.
  * classic bitonic network: for size = 2,4,..,M; for stride = size/2,..,1:
    element i exchanges with partner i ^ stride. ascending iff
    (i & size) == 0. Both masks are 2-D iota expressions.
  * partner values: i ^ stride == i + stride when the stride bit of i is
    clear, i - stride when set — so partner = where(bit_set, roll(x, +d),
    roll(x, -d)) on the lane axis (stride < 128) or sublane axis
    (stride >= 128). `pltpu.roll` is the same primitive the ring kernels
    rely on (ops/emit_pallas.py:156).
  * STABILITY: bitonic networks are unstable, so the comparator is
    lexicographic on (key, original index) — unique composite keys make
    the result exactly the stable-sort order, bit-for-bit.
  * payload: either carried through the network (`carry_payload=True`,
    every operand permuted by the same swap decisions — exact, no gather)
    or left to an XLA take_along_axis on the returned order.

Measured (v5e, b8 full config = 8 x 131072, same-process best-of-2 with
64-iter chained loops, 2026-08-20 — scripts/probe_sort_ab.py) and
honestly PARKED:

  production lax.sort (6-operand stable):   3.91 ms   (A-again control)
  bitonic 2-operand + XLA payload gather:   8.30 ms   (runs 8.7 / 8.3)
  bitonic 6-operand full carry:            24.75 ms   (runs 24.8 / 34.9)
  on-chip bit-equality vs production:      keys=True payload=True
  second independent process (confirmation): carry 10.39 / gather 10.19
  vs production 4.06 — the ~2.5x loss reproduces across processes.

The network LOSES ~2x even in its cheapest form. The VMEM-bandwidth
estimate (~620 passes over 1 MB ≈ sub-ms) is off by ~10x in practice:
each of the 153 substages carries fixed per-pass costs (the same
per-round fixed-cost floor the ring kernels measured) and the
large-shift sublane rolls do not lower to single vector shifts. The
carry variant additionally needs 16.3 MB scoped VMEM (vmem_limit_bytes
raised to 64 MB below) and its Mosaic compile takes ~10 min through the
axon compile service — disqualifying for production regardless of rate.
Kept tested (bit-equal by tests/test_sort_pallas.py) as the recorded
negative result; the XLA multi-operand sort stays the front-end default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _partner(x, stride: int, bit_set):
    """Value of each element's XOR-partner at `stride` (power of two).

    pltpu.roll only takes non-negative shifts; roll by -d == roll by
    (axis_len - d)."""
    if stride < LANES:
        plus = pltpu.roll(x, shift=stride, axis=1)
        minus = pltpu.roll(x, shift=x.shape[1] - stride, axis=1)
    else:
        r = stride // LANES
        plus = pltpu.roll(x, shift=r, axis=0)
        minus = pltpu.roll(x, shift=x.shape[0] - r, axis=0)
    return jnp.where(bit_set, plus, minus)


def _bitonic_kernel(key_ref, idx_ref, *rest, m: int, n_payload: int):
    payload_refs = rest[:n_payload]
    out_key_ref, out_idx_ref = rest[n_payload:n_payload + 2]
    out_payload_refs = rest[n_payload + 2:]

    rows = m // LANES
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)

    key = key_ref[:]
    idx = idx_ref[:]
    ops = [p_ref[:] for p_ref in payload_refs]

    size = 2
    while size <= m:
        stride = size // 2
        # ascending iff (i & size) == 0; size >= 2*LANES -> a row bit
        if size < LANES:
            asc = (lane_i & size) == 0
        elif size == LANES:
            # bit 7 of i is row bit 0
            asc = (row_i & 1) == 0
        else:
            asc = (row_i & (size // LANES)) == 0
        while stride >= 1:
            if stride < LANES:
                bit_set = (lane_i & stride) != 0
            else:
                bit_set = (row_i & (stride // LANES)) != 0
            pk = _partner(key, stride, bit_set)
            pi = _partner(idx, stride, bit_set)
            gt = (key > pk) | ((key == pk) & (idx > pi))
            take_partner = gt == (asc == jnp.logical_not(bit_set))
            key = jnp.where(take_partner, pk, key)
            idx = jnp.where(take_partner, pi, idx)
            new_ops = []
            for x in ops:
                px = _partner(x, stride, bit_set)
                new_ops.append(jnp.where(take_partner, px, x))
            ops = new_ops
            stride //= 2
        size *= 2

    out_key_ref[:] = key
    out_idx_ref[:] = idx
    for ref, x in zip(out_payload_refs, ops):
        ref[:] = x


@functools.partial(
    jax.jit,
    static_argnames=("m_pad", "carry_payload", "interpret"))
def _sort_batched(key, payload, m_pad: int, carry_payload: bool,
                  interpret: bool):
    """key (B, M) int32, payload (B, M, F) f32 -> (key_sorted, order,
    payload_sorted or None), each (B, M[,F])."""
    b, m = key.shape
    f = payload.shape[-1]
    if m_pad != m:
        key = jnp.concatenate(
            [key, jnp.full((b, m_pad - m), jnp.iinfo(jnp.int32).max,
                           jnp.int32)], axis=1)
    rows = m_pad // LANES
    key2 = key.reshape(b * rows, LANES)
    idx2 = jnp.broadcast_to(
        jnp.arange(m_pad, dtype=jnp.int32)[None], (b, m_pad)
    ).reshape(b * rows, LANES)

    n_payload = f if carry_payload else 0
    inputs = [key2, idx2]
    if carry_payload:
        pay = payload
        if m_pad != m:
            pay = jnp.concatenate(
                [pay, jnp.zeros((b, m_pad - m, f), payload.dtype)], axis=1)
        inputs += [pay[..., j].reshape(b * rows, LANES) for j in range(f)]

    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    n_in = 2 + n_payload
    out_shapes = [jax.ShapeDtypeStruct((b * rows, LANES), jnp.int32)] * 2 + \
        [jax.ShapeDtypeStruct((b * rows, LANES), payload.dtype)] * n_payload

    outs = pl.pallas_call(
        functools.partial(_bitonic_kernel, m=m_pad, n_payload=n_payload),
        grid=(b,),
        in_specs=[blk] * n_in,
        out_specs=[blk] * n_in,
        out_shape=out_shapes,
        interpret=interpret,
        # the 6-operand full-size carry variant needs 16.27 MB of scoped
        # VMEM (in+out blocks + unrolled-network temporaries) — just over
        # the 16 MB default; raise the cap rather than splitting the
        # network (bitonic needs the whole sample resident)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*inputs)

    key_s = outs[0].reshape(b, m_pad)[:, :m]
    order = outs[1].reshape(b, m_pad)[:, :m]
    if carry_payload:
        pts_s = jnp.stack(
            [o.reshape(b, m_pad)[:, :m] for o in outs[2:]], axis=-1)
        return key_s, order, pts_s
    return key_s, order, None


def sort_points_by_pillar_bitonic(points, num_points, config,
                                  carry_payload: bool = True,
                                  interpret: bool | None = None):
    """Drop-in candidate for ops/emit_pallas.sort_points_by_pillar:
    (B, M, F) points -> (gid_sorted (B, M) int32, pts_sorted (B, M, F)),
    bit-identical to the lax.sort path (stable order via the lexicographic
    (key, index) comparator)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    W, H = config.grid_w, config.grid_h
    B, M, F = points.shape
    HW = H * W
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    pt_idx = jnp.arange(M, dtype=jnp.int32)
    alive = pt_idx[None, :] < num_points[:, None]
    col = jnp.floor((x - config.x_min) / config.voxel_x).astype(jnp.int32)
    row = jnp.floor((y - config.y_min) / config.voxel_y).astype(jnp.int32)
    in_range = ((col >= 0) & (col < W) & (row >= 0) & (row < H)
                & (z >= config.z_min) & (z <= config.z_max))
    pid = jnp.where(alive & in_range, row * W + col, HW)

    m_pad = max(LANES, 1 << (M - 1).bit_length())
    key_s, order, pts_s = _sort_batched(pid, points, m_pad,
                                        carry_payload, interpret)
    if pts_s is None:
        pts_s = jnp.take_along_axis(points, order[..., None], axis=1)
    return key_s, pts_s
