"""Failure detection / preemption recovery (train/elastic.py).

The subprocess test exercises the REAL signal path: a train CLI run is
SIGTERMed mid-flight, must exit 0 with a checkpoint + 'preempted' event,
and a --resume run must continue from the checkpointed step. Subprocesses
pin --platform cpu (the TPU is single-client on this image and the plugin
ignores JAX_PLATFORMS)."""

import json
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.train import (
    GracefulShutdown, Heartbeat, NaNGuard, TrainConfig, TrainingDiverged,
    check_heartbeat, create_train_state, restore_checkpoint)
from tpu_pillars.train.loop import fit, synthetic_batches

CFG = tiny_config()
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read_events(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _cli(out, steps, extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # no need for the fake 8-device mesh here
    return subprocess.Popen(
        [sys.executable, "-m", "tpu_pillars.train.loop", "--steps",
         str(steps), "--batch", "1", "--out", out, "--platform", "cpu",
         "--seed", "0", *extra],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)


@pytest.mark.slow
def test_sigterm_preemption_checkpoint_and_resume(tmp_path):
    out = str(tmp_path / "run")
    steps = 500  # far more than the run will be allowed to finish
    proc = _cli(out, steps)
    jsonl = os.path.join(out, "train.jsonl")
    hb = os.path.join(out, "heartbeat.json")

    # wait until training has demonstrably made steps (heartbeat moving)
    deadline = time.time() + 300
    while time.time() < deadline:
        st = check_heartbeat(hb, stall_after_s=1e9)
        if st["status"] == "ok" and st["step"] >= 3:
            break
        if proc.poll() is not None:
            raise AssertionError(
                f"train CLI died early: {proc.communicate()[1].decode()[-2000:]}")
        time.sleep(0.5)
    else:
        proc.kill()
        raise AssertionError("no heartbeat progress within deadline")

    proc.send_signal(signal.SIGTERM)
    stdout, stderr = proc.communicate(timeout=120)
    assert proc.returncode == 0, stderr.decode()[-2000:]

    events = _read_events(jsonl)
    kinds = [e["event"] for e in events]
    assert "preempted" in kinds, kinds
    pre_step = [e for e in events if e["event"] == "preempted"][0]["step"]
    assert 0 < pre_step < steps

    # checkpoint exists and carries the preemption step
    ckpt = os.path.join(out, "ckpt.msgpack")
    assert os.path.exists(ckpt)
    state = restore_checkpoint(
        ckpt, create_train_state(CFG, TrainConfig(total_steps=steps,
                                                  batch_size=1)),
        config=CFG)
    assert int(state.step) == pre_step

    # resume completes the remaining steps from exactly there
    total = pre_step + 2
    proc2 = _cli(out, total, extra=("--resume",))
    stdout2, stderr2 = proc2.communicate(timeout=600)
    assert proc2.returncode == 0, stderr2.decode()[-2000:]
    events2 = _read_events(jsonl)
    starts = [e for e in events2 if e["event"] == "start"]
    assert starts[-1]["resumed_at"] == pre_step
    final = restore_checkpoint(
        os.path.join(out, "ckpt.msgpack"),
        create_train_state(CFG, TrainConfig(total_steps=total, batch_size=1)),
        config=CFG)
    assert int(final.step) == total


def test_graceful_shutdown_flag_and_restore():
    prev = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown() as s:
        assert not s()
        os.kill(os.getpid(), signal.SIGTERM)
        assert s()           # flag, not death
    assert signal.getsignal(signal.SIGTERM) is prev


def test_fit_stop_flag_checkpoints_cleanly(tmp_path):
    """In-process: stop immediately -> 0 steps run, clean checkpoint."""
    tcfg = TrainConfig(total_steps=4, batch_size=1, max_gt_boxes=4)
    state = create_train_state(CFG, tcfg)
    hb = Heartbeat(str(tmp_path / "hb.json"))
    fired = {"n": 0}

    def stop():
        fired["n"] += 1
        return fired["n"] > 2   # allow 2 steps, then preempt

    out = fit(state, synthetic_batches(CFG, tcfg, num_objects=2, clutter=50),
              steps=4, config=CFG, ckpt_path=str(tmp_path / "c.msgpack"),
              stop=stop, heartbeat=hb)
    assert int(out.step) == 2
    st = check_heartbeat(str(tmp_path / "hb.json"), stall_after_s=1e9)
    assert st == {"status": "ok", "age_s": st["age_s"], "step": 2}
    restored = restore_checkpoint(str(tmp_path / "c.msgpack"),
                                  create_train_state(CFG, tcfg))
    assert int(restored.step) == 2


@pytest.mark.slow
def test_nan_guard_diagnostic_checkpoint(tmp_path):
    tcfg = TrainConfig(total_steps=6, batch_size=1, max_gt_boxes=4)
    state = create_train_state(CFG, tcfg)
    diag = str(tmp_path / "diverged.msgpack")
    guard = NaNGuard(diag, config=CFG)

    from tpu_pillars.train import make_train_step
    real_step = jax.jit(make_train_step(CFG, iou_chunk=4096))
    calls = {"n": 0}

    def poisoned_step(s, b):
        s2, losses = real_step(s, b)
        calls["n"] += 1
        if calls["n"] >= 3:
            losses = losses._replace(total=jax.numpy.float32(np.nan))
        return s2, losses

    with pytest.raises(TrainingDiverged) as ei:
        fit(state, synthetic_batches(CFG, tcfg, num_objects=2, clutter=50),
            steps=6, config=CFG, step_fn=poisoned_step, log_every=1,
            guard=guard)
    assert ei.value.diagnostic_path == diag
    restored = restore_checkpoint(diag, create_train_state(CFG, tcfg),
                                  config=CFG)
    assert int(restored.step) == 2      # the last FINITE state, not step 3
    for leaf in jax.tree.leaves(restored.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_check_heartbeat_states(tmp_path):
    path = str(tmp_path / "hb.json")
    assert check_heartbeat(path, 10)["status"] == "missing"
    Heartbeat(path).beat(7)
    st = check_heartbeat(path, stall_after_s=60)
    assert st["status"] == "ok" and st["step"] == 7
    # age the file: rewrite with an old timestamp
    with open(path, "w") as f:
        f.write(json.dumps({"step": 7, "time": time.time() - 120}))
    st = check_heartbeat(path, stall_after_s=60)
    assert st["status"] == "stalled" and st["age_s"] > 100
