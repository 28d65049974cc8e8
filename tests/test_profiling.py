"""utils/profiling: StageTimer sync/accounting and the jax.profiler trace
context (SURVEY.md section 5 tracing/profiling row)."""

import os

import jax.numpy as jnp

from tpu_pillars.utils.profiling import StageTimer, trace


def test_stage_timer_accumulates_and_syncs():
    timer = StageTimer()
    for _ in range(3):
        with timer.stage("matmul"):
            x = jnp.ones((64, 64))
            timer.observe(x @ x)
    with timer.stage("other"):
        timer.observe(jnp.arange(8))
    s = timer.summary()
    assert s["matmul"]["count"] == 3
    assert s["other"]["count"] == 1
    assert s["matmul"]["total_s"] > 0
    # summary() rounds total_s at 1e-6 s and mean_ms at 1e-3 ms — allow
    # both roundings in the identity check
    assert abs(s["matmul"]["mean_ms"]
               - 1e3 * s["matmul"]["total_s"] / 3) < 2e-3
    # observe() passes its tree through unchanged and resets after the stage
    assert timer._result is None


def test_stage_timer_tolerates_no_observe():
    timer = StageTimer()
    with timer.stage("host_only"):
        sum(range(100))
    assert timer.summary()["host_only"]["count"] == 1


def test_trace_context_writes_profile(tmp_path):
    log_dir = str(tmp_path / "trace")
    with trace(log_dir):
        x = jnp.ones((32, 32))
        (x @ x).block_until_ready()
    # jax writes plugins/profile/<run>/*.pb under the log dir
    found = [os.path.join(r, f) for r, _, fs in os.walk(log_dir) for f in fs]
    assert found, "profiler trace produced no files"
