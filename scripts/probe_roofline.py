#!/usr/bin/env python
"""Speed-of-light anchors for docs/PERF.md: measure THIS chip's achievable
ceilings (big-matmul TFLOP/s at the three precisions, HBM stream GB/s), then
the detector's conv tier (RPN backbone + SSD head forward, batch 8) against
an analytic FLOP count — the honest "percent of speed-of-light" number for
the stage where the model's FLOPs live.

All loops are chained on a data dependency and end with a host pull (the
only true barrier through the axon tunnel). Run alone on the chip.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def conv_tier_flops(cfg, batch: int) -> float:
    """Analytic MAC*2 count of RPN backbone + SSD head at full size.

    3x3 convs: out_H*out_W*9*Cin*Cout; ConvTranspose(k=s, stride=s):
    in_H*in_W*s^2*Cin*Cout; head = 1x1 convs at stride-2 resolution over
    the 3*up concat producing (cls 9 + box 7 + dir 2) * anchors_per_loc."""
    flops = 0.0
    cin = cfg.pfn_channels
    h, w = cfg.grid_h, cfg.grid_w
    for ch, n in zip(cfg.rpn_channels, cfg.rpn_layers):
        h, w = h // 2, w // 2
        for i in range(n):
            c_in = cin if i == 0 else ch
            flops += 2 * h * w * 9 * c_in * ch
        cin = ch
    # up blocks: block i (at stride 2^(i+1)) deconvs by 2^i to stride 2
    h, w = cfg.grid_h, cfg.grid_w
    for i, ch in enumerate(cfg.rpn_channels):
        h, w = h // 2, w // 2
        s = 2 ** i
        flops += 2 * h * w * s * s * ch * cfg.rpn_up_channels
    hh, ww = cfg.grid_h // cfg.head_stride, cfg.grid_w // cfg.head_stride
    cat = cfg.rpn_up_channels * len(cfg.rpn_channels)
    out_ch = cfg.anchors_per_loc * (cfg.num_classes + 7 + 2)
    flops += 2 * hh * ww * cat * out_ch
    return flops * batch


def pfn_tier_flops(cfg, batch: int) -> float:
    """Analytic MAC*2 of the PFN linear (decorated D -> C per point)."""
    return (2.0 * batch * cfg.max_pillars * cfg.max_points_per_pillar
            * cfg.num_decorated_features * cfg.pfn_channels)


def train_step_flops(cfg, batch: int) -> float:
    """Analytic MXU FLOPs of one remat='all' train step, conv+PFN tiers
    only (assigner rotated-IoU is VPU work and is excluded — so the MFU
    computed from this is a LOWER bound on true utilization).

    Convention: fwd F + bwd (dL/dx + dL/dW) 2F + remat recompute F = 4F.
    """
    return 4.0 * (conv_tier_flops(cfg, batch) + pfn_tier_flops(cfg, batch))


def run_train_section(results) -> None:
    """Train-step MFU rows. MUST run in a fresh process before any
    inference section: measured 2026-08-18, a train step timed AFTER
    inference loops in one process reads 328 ms vs 153 fresh (CLAUDE.md);
    main() orders this first for that reason."""
    import jax
    import time as _t

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.train.loop import synthetic_batches
    from tpu_pillars.train.state import TrainConfig, create_train_state
    from tpu_pillars.train.step import make_train_step

    cfg = PillarsConfig()
    sizes = (8,) if "--b8only" in sys.argv else (4, 8)
    for B in sizes:
        tcfg = TrainConfig(batch_size=B)
        state = create_train_state(cfg, tcfg)
        batch = next(iter(synthetic_batches(
            cfg, tcfg, seed=0, num_objects=40, points_per_object=300,
            clutter=60000)))
        step = jax.jit(make_train_step(cfg))
        state, losses = step(state, batch)  # compile
        np.asarray(losses.total)
        iters = 10
        t0 = _t.perf_counter()
        for _ in range(iters):
            state, losses = step(state, batch)
        np.asarray(losses.total)
        dt = (_t.perf_counter() - t0) / iters
        fl = train_step_flops(cfg, B)
        results[f"train_step_ms_b{B}"] = round(dt * 1e3, 1)
        results[f"train_step_tflops_b{B}"] = round(fl / dt / 1e12, 2)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_pillars.config import PillarsConfig

    results = {}
    sys.stderr.write(f"backend={jax.default_backend()}\n")

    if "--train" in sys.argv:
        # fresh-process train-step MFU only (see run_train_section note)
        run_train_section(results)
        for k, v in results.items():
            sys.stderr.write(f"{k}: {v}\n")
        print(json.dumps(results))
        return

    def timeit(fn, x, iters, warm=2):
        for _ in range(warm):
            x = fn(x)
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])
        return (time.perf_counter() - t0) / iters

    # --- MXU ceiling: chained 8192^3 matmul (1.1 TFLOP/iter). Operands
    # ride the chained STATE, never a closure: a closed-over 268 MB
    # matrix embeds as an HLO constant and blows the axon remote-compile
    # request limit (HTTP 413, measured 2026-08-20). The left operand
    # evolves (spectral norm ~2 per iter — fine in f32 for 12 iters).
    n = 8192
    flops = 2.0 * n * n * n
    key = jax.random.PRNGKey(0)
    a32 = jax.random.normal(key, (n, n), jnp.float32) / np.sqrt(n)

    @jax.jit
    def mm_default(state):
        a, b = state
        return jnp.dot(a, b), b

    @jax.jit
    def mm_highest(state):
        a, b = state
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST), b

    a16 = a32.astype(jnp.bfloat16)

    @jax.jit
    def mm_bf16(state):
        a, b = state
        return jnp.dot(a, b), b

    dt = timeit(mm_default, (a32, a32), 12)
    results["matmul_f32_default_tflops"] = round(flops / dt / 1e12, 1)
    dt = timeit(mm_bf16, (a16, a16), 12)
    results["matmul_bf16_tflops"] = round(flops / dt / 1e12, 1)
    dt = timeit(mm_highest, (a32, a32), 6)
    results["matmul_f32_highest_tflops"] = round(flops / dt / 1e12, 1)

    # --- HBM stream ceiling: chained elementwise on 512 MB (1 GB r+w) ---
    big = jnp.ones((128 * 1024 * 1024,), jnp.float32)

    @jax.jit
    def stream(x):
        return x * 1.0000001

    dt = timeit(stream, big, 20)
    results["hbm_stream_gbs"] = round(2 * big.nbytes / dt / 1e9, 0)

    # --- detector conv tier: RPN backbone + SSD head fwd, batch 8 ---
    from tpu_pillars.models.backbone import RPNBackbone
    from tpu_pillars.models.head import SSDHead

    cfg = PillarsConfig()
    B = 8
    rpn = RPNBackbone(channels=cfg.rpn_channels, layers=cfg.rpn_layers,
                      up_channels=cfg.rpn_up_channels)
    head = SSDHead(num_classes=cfg.num_classes,
                   anchors_per_loc=cfg.anchors_per_loc)
    canvas = jax.random.normal(key, (B, cfg.grid_h, cfg.grid_w,
                                     cfg.pfn_channels), jnp.float32) * 0.1
    vr = rpn.init(jax.random.PRNGKey(1), canvas[:1])
    feat1 = rpn.apply(vr, canvas[:1])
    vh = head.init(jax.random.PRNGKey(2), feat1)

    @jax.jit
    def fwd(x):
        f = rpn.apply(vr, x)
        cls, box, dirs = head.apply(vh, f)
        # chain: fold ALL THREE outputs back into the input so no head
        # conv is dead-code-eliminated out of the timed program
        return x + 1e-12 * (cls.sum() + box.sum() + dirs.sum())

    dt = timeit(fwd, canvas, 12)
    fl = conv_tier_flops(cfg, B)
    results["conv_tier_ms_b8"] = round(dt * 1e3, 2)
    results["conv_tier_gflop_b8"] = round(fl / 1e9, 1)
    results["conv_tier_tflops"] = round(fl / dt / 1e12, 1)
    results["conv_tier_pct_of_matmul_default"] = round(
        100 * (fl / dt / 1e12) / results["matmul_f32_default_tflops"], 1)

    for k, v in results.items():
        sys.stderr.write(f"{k}: {v}\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
