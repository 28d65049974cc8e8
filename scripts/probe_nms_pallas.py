"""A/B the block-gated Pallas NMS (ops/nms_pallas.py) vs the XLA fixpoint
(ops/nms.py) on the real TPU, batch-8 vmapped at the full operating point
(K = pre_nms_top_k = 1024), on class-shifted candidates shaped like
_nms_and_pack's input.

Run: timeout 1800 python scripts/probe_nms_pallas.py
(one process; kernels compile in seconds, but budget for the axon
first-large-compile pathology anyway — CLAUDE.md.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import PillarsConfig
from tpu_pillars.ops.nms import rotated_nms
from tpu_pillars.ops.nms_pallas import overlap_matrix_pallas, rotated_nms_pallas


def log(msg):
    sys.stderr.write(msg + "\n")
    sys.stderr.flush()


def timed(fn, args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])       # compile + true sync
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])   # host pull = honest barrier
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def make_candidates(rng, cfg, B, K):
    """Class-shifted candidate sets: clustered same-class groups (real NMS
    load) + background spread, ~60% valid, score-sorted by construction."""
    span_x = cfg.x_max - cfg.x_min
    span_y = cfg.y_max - cfg.y_min
    shift = 4.0 * (span_x + span_y)
    boxes = np.zeros((B, K, 7), np.float32)
    valid = np.zeros((B, K), bool)
    cls_out = np.zeros((B, K), np.int32)
    for b in range(B):
        n = int(0.6 * K)
        cls = rng.integers(0, cfg.num_classes, n)
        cls_out[b, :n] = cls
        # ~40 cluster centers; candidates pile onto them like real head
        # output does around true objects
        centers = rng.uniform(-40, 40, (40, 2))
        pick = rng.integers(0, len(centers), n)
        xy = centers[pick] + rng.normal(0, 1.2, (n, 2))
        boxes[b, :n, 0] = xy[:, 0] + cls * shift
        boxes[b, :n, 1] = xy[:, 1]
        boxes[b, :n, 2] = rng.uniform(-1, 1, n)
        boxes[b, :n, 3] = rng.uniform(0.6, 3.0, n)
        boxes[b, :n, 4] = rng.uniform(0.8, 6.0, n)
        boxes[b, :n, 5] = rng.uniform(0.5, 3.0, n)
        boxes[b, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        valid[b, :n] = True
    return jnp.asarray(boxes), jnp.asarray(valid), jnp.asarray(cls_out)


def main():
    cfg = PillarsConfig()
    K = cfg.pre_nms_top_k
    B = 8
    thr = cfg.nms_iou_threshold
    log(f"backend={jax.default_backend()} K={K} B={B} thr={thr}")
    rng = np.random.default_rng(0)
    boxes, valid, cls = make_candidates(rng, cfg, B, K)

    nms_x = jax.jit(jax.vmap(
        lambda b, v: rotated_nms(b, jnp.zeros(K), v, thr)))
    nms_p = jax.jit(jax.vmap(
        lambda b, v: rotated_nms_pallas(b, jnp.zeros(K), v, thr)))
    nms_pc = jax.jit(jax.vmap(
        lambda b, v, c: rotated_nms_pallas(b, jnp.zeros(K), v, thr,
                                           class_ids=c)))

    kx = np.asarray(nms_x(boxes, valid))
    kp = np.asarray(nms_p(boxes, valid))
    kc = np.asarray(nms_pc(boxes, valid, cls))
    log(f"keep agreement: score-order {(kx == kp).mean():.6f} "
        f"class-blocked {(kx == kc).mean():.6f} "
        f"kept: xla={int(kx.sum())} pallas={int(kp.sum())}/{int(kc.sum())}")

    t_x = timed(nms_x, (boxes, valid))
    t_p = timed(nms_p, (boxes, valid))
    t_c = timed(nms_pc, (boxes, valid, cls))
    log(f"batch-{B} full NMS: xla fixpoint {t_x:.2f} ms  "
        f"pallas score-order {t_p:.2f} ms  "
        f"pallas class-blocked {t_c:.2f} ms")

    # overlap matrix alone (the part the kernel replaces)
    from tpu_pillars.ops.iou import rotated_iou_bev_chunked

    def over_x(b):
        iou = rotated_iou_bev_chunked(b, b, chunk=min(K, 256))
        idx = jnp.arange(K)
        return (iou > thr) & (idx[:, None] < idx[None, :])

    ov_x = jax.jit(jax.vmap(over_x))
    ov_p = jax.jit(jax.vmap(
        lambda b: overlap_matrix_pallas(b, thr)))
    t_ox = timed(ov_x, (boxes,))
    t_op = timed(ov_p, (boxes,))
    log(f"batch-{B} over-matrix: xla {t_ox:.2f} ms  pallas {t_op:.2f} ms")

    # --- full postprocess (wire layout) both ways: the decision metric ---
    from tpu_pillars.detector import build_postprocess_fn
    from tpu_pillars.ops.postprocess import top_k_two_stage

    A = cfg.num_anchors
    own = jnp.asarray(rng.normal(-4, 1.5, (B, A)).astype(np.float32))
    box_p = jnp.asarray(rng.normal(0, 0.1, (B, 7, A)).astype(np.float32))
    dir_p = jnp.asarray(rng.normal(0, 1, (B, 2, A)).astype(np.float32))
    t_post = {}
    for impl in ("fixpoint", "pallas"):
        post = jax.jit(jax.vmap(build_postprocess_fn(cfg, nms_impl=impl)))
        t_post[impl] = timed(post, (own, box_p, dir_p), iters=15)
        log(f"batch-{B} full postprocess [{impl}]: {t_post[impl]:.2f} ms")
    # the DECISION metric is the full postprocess with the wiring
    # _nms_and_pack actually uses (class-blocked pallas vs fixpoint)
    log("verdict: " + ("PALLAS WINS — flip nms_impl default"
                       if t_post["pallas"] < t_post["fixpoint"]
                       else "XLA FIXPOINT KEEPS DEFAULT")
        + f" (postprocess {t_post['pallas']:.2f} vs "
        f"{t_post['fixpoint']:.2f} ms; NMS-only best pallas "
        f"{min(t_p, t_c):.2f} vs {t_x:.2f} ms)")

    # --- exact two-stage top-k vs lax.top_k at the A=720k operating point
    from jax import lax

    k = cfg.pre_nms_top_k
    f1 = jax.jit(jax.vmap(lambda v: lax.top_k(v, k)))
    t1 = timed(f1, (own,), iters=15)
    for rows in (32, 64, 128):
        f2 = jax.jit(jax.vmap(
            lambda v, r=rows: top_k_two_stage(v, k, rows=r)))
        t2 = timed(f2, (own,), iters=15)
        log(f"batch-{B} top-{k} of {A}: lax {t1:.2f} ms  "
            f"two-stage(rows={rows}) {t2:.2f} ms")


if __name__ == "__main__":
    main()
