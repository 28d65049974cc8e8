#!/usr/bin/env python
"""TPU environment health probe (CLAUDE.md recipe).

Prints:
  - trivial 512x512 matmul + host-pull wall time (wake-up absorber)
  - chained 20-dispatch null-loop ms/iter, run TWICE (healthy: ~2-3 ms/iter
    both times; collapse window 2026-08-20 read 6-45 ms with +/-7x variance
    between back-to-back loops)
  - small-matmul rate (1024x1024 f32 matmul chain)

Exit code 0 if healthy (both null loops < 5 ms/iter and within 2x of each
other), 2 if degraded. Correctness work is always valid; timing decisions
only when healthy.
"""
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jnp.ones((512, 512), jnp.float32)
    np.asarray(jax.jit(lambda a: a @ a)(x))
    wake = time.perf_counter() - t0
    print(f"wakeup probe (512x512 matmul + pull): {wake:.2f} s "
          f"backend={jax.default_backend()}", flush=True)

    # chained 20-dispatch null loop: y = x + 1 twenty times, one pull
    f = jax.jit(lambda a: a + 1.0)
    y = f(x)
    np.asarray(y)  # compile + sync

    def null_loop():
        t = time.perf_counter()
        z = x
        for _ in range(20):
            z = f(z)
        np.asarray(z.ravel()[0:1])
        return (time.perf_counter() - t) / 20 * 1e3

    warm = null_loop()  # fresh-process dispatch-path warm-up: reads ~50
    # ms/iter the FIRST chained loop of a process even on a healthy chip
    # (measured 2x 2026-08-20); never use loop #1 for a health decision
    a = null_loop()
    b = null_loop()
    print(f"null loop ms/iter: warm {warm:.2f}, then {a:.2f}, {b:.2f}",
          flush=True)

    m = jnp.ones((1024, 1024), jnp.float32)
    g = jax.jit(lambda a: a @ a)
    np.asarray(g(m).ravel()[0:1])
    t = time.perf_counter()
    z = m
    for _ in range(10):
        z = g(z)
    np.asarray(z.ravel()[0:1])
    mm = (time.perf_counter() - t) / 10 * 1e3
    print(f"1024^2 matmul chain: {mm:.2f} ms/iter", flush=True)

    # tunnel bandwidth: host->device->host round-trip of 2 MiB, best of 2.
    # The tunnel degrades INDEPENDENTLY of dispatch (2026-08-20: null loop
    # healthy at 2 ms while a sweep upload ran ~1 MB/s vs the 30-60 norm)
    payload = np.ones((512, 1024), np.float32)

    def rt():
        t0 = time.perf_counter()
        np.asarray(jnp.asarray(payload))
        return time.perf_counter() - t0

    rt()
    bw = 2 * payload.nbytes / min(rt(), rt()) / 1e6
    print(f"tunnel round-trip: {bw:.1f} MB/s", flush=True)

    healthy = (a < 5.0 and b < 5.0
               and max(a, b) / max(min(a, b), 1e-9) < 2.0
               and bw > 15.0)
    print(f"HEALTHY: {healthy}", flush=True)
    return 0 if healthy else 2


if __name__ == "__main__":
    sys.exit(main())
