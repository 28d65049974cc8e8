#!/usr/bin/env python
"""Benchmark: jitted TPU points->boxes pipeline vs the CPU reference
(BASELINE.md: the CPU baseline must be MEASURED, not cited; north-star is
>=10x CPU sweeps/sec/chip).

Prints the driver JSON line
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
INCREMENTALLY: the CPU baseline is measured FIRST, and a complete, valid
JSON line is (re-)printed after EVERY successful TPU timed section with the
best rate so far. A SIGTERM/SIGINT/atexit handler re-prints the best-so-far
line, so a driver timeout mid-section still yields a parseable artifact.
(Round 3 lost its headline number to exactly that: rc=124 between the
batch-8 section and the single final print — VERDICT.md weak #1.)

Every printed JSON line is complete and self-consistent, so the artifact is
valid whether the driver takes the first or the last JSON line it finds.
Per-section wall-times and the first-large-compile duration go to stderr so
a slow run is self-diagnosing (the known first-compile pathology can
intermittently cost 10-17 min in a fresh process — CLAUDE.md).

Runs on whatever jax.default_backend() is (the driver runs it on the real
TPU chip). The CPU baseline (NumPy pillarize + torch-CPU forward + NumPy
rotated NMS) is measured in-process on a few frames.

Optional sections (p50 latency probes — extra compiles, stderr-only
output) are skipped when the elapsed wall time exceeds BENCH_BUDGET_S
(default 1500 s), so a compile stall cannot push auxiliary work past the
driver's timeout.
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import sys
import time

import numpy as np

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))


class Reporter:
    """Holds the best-so-far headline and prints it as the driver JSON line.

    emit() is idempotent-safe: each call prints a COMPLETE valid line, so
    the artifact parses under first-line-wins or last-line-wins."""

    def __init__(self) -> None:
        self.cpu_rate: float | None = None
        self.best_rate: float = 0.0
        self._installed = False

    def note_rate(self, rate: float, label: str) -> None:
        self.best_rate = max(self.best_rate, rate)
        self.emit(reason=label)

    def emit(self, reason: str = "final") -> None:
        if self.best_rate <= 0.0:
            return  # nothing honest to report yet
        rec = {
            "metric": "lidar sweeps/sec/chip e2e (points->boxes)",
            "value": round(self.best_rate, 3),
            "unit": "sweeps/s",
        }
        if self.cpu_rate:
            rec["vs_baseline"] = round(self.best_rate / self.cpu_rate, 2)
        sys.stderr.write(f"[emit after {reason}]\n")
        print(json.dumps(rec), flush=True)

    def install_handlers(self) -> None:
        if self._installed:
            return
        self._installed = True

        def on_signal(signum, frame):
            sys.stderr.write(f"[signal {signum} -> emitting best-so-far]\n")
            self.emit(reason=f"signal {signum}")
            # skip atexit double-print; exit immediately
            os._exit(0 if self.best_rate > 0 else 1)

        signal.signal(signal.SIGTERM, on_signal)
        signal.signal(signal.SIGINT, on_signal)
        atexit.register(lambda: self.emit(reason="atexit"))


REPORTER = Reporter()


def section(name: str):
    """Context manager: stderr wall-time line per section (self-diagnosing
    artifact — VERDICT.md weak #2)."""
    class _S:
        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            total = time.perf_counter() - T_START
            sys.stderr.write(
                f"[section {name}: {dt:.1f}s; total {total:.1f}s]\n")
            return False
    return _S()


def over_budget() -> bool:
    return time.perf_counter() - T_START > BUDGET_S


def main() -> None:
    REPORTER.install_handlers()

    from tpu_pillars.config import PillarsConfig
    from tpu_pillars.data.synthetic import make_scene

    cfg = PillarsConfig()  # full operating point: 400x400, 12k pillars, 9 cls
    rng = np.random.default_rng(0)

    # realistic sweep density: ~100k points in range; distinct scenes so no
    # proxy-level caching can flatter the numbers
    with section("make_scenes"):
        scenes = [
            make_scene(rng, cfg, num_objects=40, points_per_object=300,
                       clutter=90000)
            for _ in range(8)
        ]

    # --- CPU reference baseline FIRST (no TPU dependency: torch weights
    # initialized natively) so vs_baseline exists before any TPU compile
    # can stall. Best frame time: robust to transient host load and
    # conservative for the reported speedup ratio.
    with section("cpu_baseline"):
        from tpu_pillars.reference_cpu.pipeline import CPUReferenceDetector
        cpu = CPUReferenceDetector(cfg)
        cpu.predict_raw(scenes[0].points)  # warm caches
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            cpu.predict_raw(scenes[i % len(scenes)].points)
            times.append(time.perf_counter() - t0)
        cpu_dt = min(times)
        REPORTER.cpu_rate = 1.0 / cpu_dt
        sys.stderr.write(f"cpu reference (best of {len(times)}): "
                         f"{1.0 / cpu_dt:.3f} sweeps/s ({cpu_dt:.2f} s/sweep)\n")

    # --- TPU path. First touch of the backend: a trivial probe absorbs the
    # tunnel wake-up (can cost minutes after an idle gap) visibly.
    import jax
    import jax.numpy as jnp

    with section("tpu_wakeup_probe"):
        x = jnp.ones((512, 512), jnp.float32)
        np.asarray(jax.jit(lambda a: a @ a)(x))  # host pull = true barrier
    sys.stderr.write(
        f"backend={jax.default_backend()} points/sweep="
        f"{[len(s.points) for s in scenes[:3]]}...\n")

    with section("build_detector"):
        from tpu_pillars.detector import Detector
        from tpu_pillars.models import PointPillars
        from tpu_pillars.ops.voxelize import PillarBatch

        # weights: init (BN identity) — throughput does not depend on values
        model = PointPillars(cfg)
        dummy = PillarBatch(
            jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                       cfg.num_decorated_features)),
            jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
            jnp.zeros((cfg.max_pillars, 2), jnp.int32),
            jnp.zeros((cfg.max_pillars,), bool),
        )
        variables = model.init(jax.random.PRNGKey(0), dummy)

        # bucketed upload shapes (16384-spaced static grid): each sweep pads
        # to the smallest fitting bucket — bit-equal boxes by test
        # (test_detector_e2e.py), +2-5% on the transfer-bound loops.
        det = Detector(cfg, variables,
                       wire_buckets=tuple(range(16384, cfg.max_points + 1,
                                                16384)))
        padded = [det.pad_points(s.points) for s in scenes]

    # --- e2e serving loop: host points in -> host boxes out, every frame.
    # Packed detections = ONE d2h transfer per sweep; a small software
    # pipeline (depth 3) overlaps frame i's result pull with frame i+k's
    # upload/compute — real serving does the same. The result pull is the
    # only honest sync on this backend (block_until_ready returns early
    # through the axon proxy).
    from collections import deque

    def serve(iters, depth=3):
        pending = deque()
        results = []
        t0 = time.perf_counter()
        for i in range(iters):
            out = det.predict_packed(scenes[i % len(scenes)].points)
            pending.append(out)
            if len(pending) > depth:
                results.append(np.asarray(pending.popleft()))
        while pending:
            results.append(np.asarray(pending.popleft()))
        return time.perf_counter() - t0, results

    # This is the process's first LARGE compile — the intermittent
    # 10-17 min pathology (CLAUDE.md) lands here if it lands at all.
    with section("single_sweep_compile(first large compile)"):
        serve(2)  # compile + warm

    # best-of-2 timed runs throughout (mirroring the CPU baseline's
    # best-of-3): this environment drifts +/-15% same-day (CLAUDE.md),
    # and a best-of is robust to transient tunnel/host load without
    # flattering the number
    with section("single_sweep_loop"):
        dt = min(serve(24)[0], serve(24)[0])
        rate = 24 / dt
        sys.stderr.write(f"single-sweep serving loop (host-to-host, depth-3): "
                         f"{rate:.2f} sweeps/s ({1e3 * dt / 24:.1f} ms/sweep)\n")
        REPORTER.note_rate(rate, "single_sweep_loop")

    # threaded stream (Detector.predict_stream default): a producer thread
    # pads+uploads+dispatches while this thread pulls results, so the
    # blocking h2d copy overlaps the result download instead of serializing
    # with it — the honest single-sweep serving pattern. Same executable:
    # no new compile.
    with section("stream_loop"):
        def stream_once():
            t0 = time.perf_counter()
            n_out = sum(1 for _ in det.predict_stream(
                (scenes[i % len(scenes)].points for i in range(24)), depth=3))
            assert n_out == 24
            return time.perf_counter() - t0

        dt_s = min(stream_once(), stream_once())
        stream_rate = 24 / dt_s
        sys.stderr.write(f"single-sweep threaded stream (host-to-host): "
                         f"{stream_rate:.2f} sweeps/s "
                         f"({1e3 * dt_s / 24:.1f} ms/sweep)\n")
        REPORTER.note_rate(stream_rate, "stream_loop")

    # --- batch-8 path (BASELINE config #2): second large compile ---
    B = 8
    pts_b = np.stack([p for p, _ in padded])
    n_b = np.asarray([c for _, c in padded])
    with section("batch8_compile"):
        np.asarray(det.predict_packed_batch(pts_b, n_b))  # compile + sync
    reps = 6

    def batch_once():
        t0 = time.perf_counter()
        pending = deque()
        for r in range(reps):
            pending.append(det.predict_packed_batch(pts_b, n_b))
            if len(pending) > 2:
                np.asarray(pending.popleft())
        while pending:
            np.asarray(pending.popleft())
        return time.perf_counter() - t0

    with section("batch8_loop"):
        dt_b = min(batch_once(), batch_once())
        batch_rate = reps * B / dt_b
        sys.stderr.write(f"batch-{B} serving loop (host-to-host): "
                         f"{batch_rate:.2f} "
                         f"sweeps/s ({1e3 * dt_b / (reps * B):.1f} ms/sweep)\n")
        REPORTER.note_rate(batch_rate, "batch8_loop")

    # (An int16 fixed-point wire was measured r3 and kept OUT of this
    # bench: this environment's tunnel fast-paths f32 buffers — the int16
    # upload measured 3x SLOWER despite half the bytes — and its ~2 mm
    # quantization rebins cell-border points, drifting boxes more than the
    # opt-in contract promises. See Detector(wire_dtype=jnp.int16).)

    # --- OPTIONAL: p50 voxelize + NMS-stage latency (stderr-only; two more
    # compiles). Skipped if the budget is spent — these must never cost the
    # round its headline number.
    if over_budget():
        sys.stderr.write("[skipping p50 latency probes: over budget]\n")
        return
    with section("p50_latency_probes"):
        from tpu_pillars.ops.emit_pallas import pillarize_auto

        pill = jax.jit(lambda p, n: pillarize_auto(p, n, cfg))
        d_pts = [jnp.asarray(p) for p, _ in padded[:6]]
        n0 = padded[0][1]
        o1 = det._model(det.variables, d_pts[0], n0)

        def lat(fn, args_list, iters=15):
            times = []
            for i in range(iters):
                t0 = time.perf_counter()
                out = fn(args_list[i % len(args_list)])
                np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])  # true sync
                times.append(time.perf_counter() - t0)
            return float(np.median(times) * 1e3)

        lat(lambda d: pill(d, n0), d_pts, iters=2)  # compile
        p50_vox = lat(lambda d: pill(d, n0), d_pts)
        lat(lambda _: det._post(*o1), [None], iters=2)
        p50_post = lat(lambda _: det._post(*o1), [None])
        sys.stderr.write(
            f"p50 voxelize latency: {p50_vox:.1f} ms; "
            f"p50 decode+NMS (postprocess) latency: {p50_post:.1f} ms "
            f"(incl. ~1-2 RTT dispatch+sync overhead on this link)\n")


if __name__ == "__main__":
    main()
