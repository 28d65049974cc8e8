"""On-device rotated NMS (SURVEY.md section 2 'Rotated NMS' — hot loop #4,
and section 7 hard part (a)).

Exact greedy NMS, reformulated for TPU as a FIXPOINT of whole-matrix vector
ops — no sequential loop over boxes at all:

  1. the K x K "overlaps > threshold" bool matrix is one data-parallel VPU
     job (ops.iou candidate-vertex formulation);
  2. greedy keeping is the unique solution of
         keep_i = valid_i  AND  no j < i with (keep_j AND overlap_ji);
     iterate that equation from keep = valid until it stops changing. Each
     sweep is one masked (K, K) any-reduction (~1M bool ops, microseconds on
     the VPU); convergence takes max-suppression-chain-depth sweeps
     (typically < 8, bounded by K), inside one `lax.while_loop`.

Rejected alternatives, measured on v5e: a lax.scan over K=1024 boxes costs
~0.5 ms/step of loop overhead (~540 ms total); an unrolled blocked sweep
compiles pathologically slowly through the remote TPU compiler (>15 min).

Semantics are bit-identical to the sequential greedy (a suppressed box never
suppresses others; ties break by lowest index) — fidelity tests pin this
against reference_cpu.rotated_nms_np.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tpu_pillars.ops.iou import rotated_iou_bev_chunked


@partial(jax.jit, static_argnames=("iou_threshold",))
def rotated_nms(boxes, scores, valid, iou_threshold: float):
    """Greedy rotated BEV NMS over score-sorted boxes.

    boxes: (K, 7) sorted by descending score (caller guarantees order);
    scores: (K,) descending (unused — order is positional); valid: (K,) bool
    — padding / below-threshold slots, never kept and never suppressing.

    Returns keep: (K,) bool.
    """
    del scores  # order is positional; scores only document the contract
    K = boxes.shape[0]
    iou = rotated_iou_bev_chunked(boxes, boxes, chunk=min(K, 256))  # (K, K)
    idx = jnp.arange(K)
    # over[j, i]: higher-ranked j (j < i) overlaps i enough to suppress it
    over = (iou > iou_threshold) & (idx[:, None] < idx[None, :])

    # carry = (keep, prev_keep, it); both keep arrays derive from `valid` so
    # the carry stays type/vma-consistent under shard_map
    def sweep(state):
        keep, _, it = state
        suppressed = jnp.any(keep[:, None] & over, axis=0)
        new_keep = valid & ~suppressed
        return new_keep, keep, it + 1

    # (Unrolling the first 8 sweeps before the while_loop was tried in r3
    # on the theory that while_loop iterations carry ~0.5 ms of overhead —
    # measured postprocess 15.4 ms unrolled vs 14.6 plain at batch 8: no
    # win, reverted. The while_loop iterations are NOT the cost here.)
    def cond(state):
        keep, prev, it = state
        return (it == 0) | (jnp.any(keep != prev) & (it < K))

    keep, _, _ = lax.while_loop(
        cond, sweep, (valid, jnp.zeros_like(valid), jnp.zeros((), jnp.int32))
    )
    return keep