"""Failure detection + preemption recovery for training (SURVEY.md section 5
'Failure detection / elastic' — the one aux subsystem round 2 left unbuilt).

The TPU-idiomatic failure story is NOT rank-level elasticity (there are no
ranks: one controller drives the mesh and XLA collectives are compiled into
the program) — it is fail-stop + fast resume:

  * preemption: maintenance events deliver SIGTERM. :class:`GracefulShutdown`
    turns it into a flag the fit loop polls once per step, so the run
    checkpoints its exact state and exits 0; ``--resume`` then replays the
    seeded data stream for a bit-equal continuation (tests pin this).
  * divergence: the way a training run actually dies on-chip is a silent
    NaN/overflow that poisons every later step. :class:`NaNGuard` checks the
    (already host-pulled) loss at the logging cadence, keeps a handle to the
    last known-finite state, and on divergence saves that state as a
    diagnostic checkpoint before raising :class:`TrainingDiverged` — the
    forensic artifact is the state BEFORE the poison step.
  * stalls: a hung collective or a wedged compile stalls the single
    controller, so one :class:`Heartbeat` file covers the whole mesh. The
    fit loop beats every step; an external supervisor (or
    :func:`check_heartbeat` from a cron) flags a run whose file has gone
    quiet and can kill/restart it — restart safety is exactly the
    preemption path above.

Nothing here imports device code; it is pure host-side control plane.
"""

from __future__ import annotations

import json
import math
import os
import signal
import time
from typing import Optional


class GracefulShutdown:
    """Context manager: converts SIGTERM (and optionally SIGINT) into a
    polled flag. Re-raising semantics: the previous handler is restored on
    exit; a second signal while shutdown is already pending falls through
    to the previous handler (so a stuck run can still be hard-killed)."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._previous = {}
        self.requested = False

    def _handler(self, signum, frame):
        if self.requested:                      # second signal: escalate
            prev = self._previous.get(signum, signal.SIG_DFL)
            signal.signal(signum, prev)
            os.kill(os.getpid(), signum)
            return
        self.requested = True

    def __enter__(self):
        for s in self._signals:
            self._previous[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        return False

    def __call__(self) -> bool:
        return self.requested


class Heartbeat:
    """Atomic single-line JSON heartbeat: {"step": N, "time": unix_s}.
    One write + rename per beat — cheap enough for every step, safe for a
    concurrent reader."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def beat(self, step: int) -> None:
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"step": int(step), "time": time.time()}))
        os.replace(tmp, self.path)


def check_heartbeat(path: str, stall_after_s: float) -> dict:
    """Supervisor-side stall check. Returns
    {"status": "missing"|"ok"|"stalled", "age_s": float, "step": int}."""
    try:
        with open(path) as f:
            rec = json.loads(f.read())
    except (FileNotFoundError, json.JSONDecodeError):
        return {"status": "missing", "age_s": math.inf, "step": -1}
    age = time.time() - float(rec.get("time", 0.0))
    return {
        "status": "stalled" if age > stall_after_s else "ok",
        "age_s": age,
        "step": int(rec.get("step", -1)),
    }


class TrainingDiverged(RuntimeError):
    """Raised by NaNGuard; .diagnostic_path points at the last-finite-state
    checkpoint (None if no finite state was ever observed)."""

    def __init__(self, msg: str, diagnostic_path: Optional[str]):
        super().__init__(msg)
        self.diagnostic_path = diagnostic_path


class NaNGuard:
    """Divergence detector. Call ``observe(state, loss)`` whenever the loss
    is on host anyway (the logging cadence — checking every step would force
    an extra device sync); holds a reference to the last finite state."""

    def __init__(self, diagnostic_path: Optional[str] = None, config=None):
        self.diagnostic_path = diagnostic_path
        self.config = config
        self._last_finite_state = None
        self._last_finite_step = -1

    def observe(self, state, loss: float) -> None:
        if math.isfinite(loss):
            self._last_finite_state = state
            self._last_finite_step = int(state.step)
            return
        saved = None
        if self.diagnostic_path and self._last_finite_state is not None:
            from tpu_pillars.train.checkpoint import save_checkpoint

            save_checkpoint(self.diagnostic_path, self._last_finite_state,
                            config=self.config)
            saved = self.diagnostic_path
        raise TrainingDiverged(
            f"non-finite loss {loss!r} at step {int(state.step)} "
            f"(last finite state: step {self._last_finite_step}"
            f"{', saved to ' + saved if saved else ''})",
            diagnostic_path=saved)
