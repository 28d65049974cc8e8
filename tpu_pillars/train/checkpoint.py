"""Checkpoint save/restore (SURVEY.md section 5 'Checkpoint / resume'):
params + batch_stats + opt_state + step as one msgpack file via flax
serialization — the functional-pytree replacement for torch.save(state_dict).
Writes are atomic (tmp file + rename) so an interrupted save never corrupts
the previous checkpoint.
"""

from __future__ import annotations

import os
import tempfile


from flax import serialization

from tpu_pillars.train.state import TrainState


def save_checkpoint(path: str, state: TrainState) -> None:
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    data = serialization.to_bytes(payload)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (same config/optimizer)."""
    with open(path, "rb") as f:
        data = f.read()
    target = {
        "step": template.step,
        "params": template.params,
        "batch_stats": template.batch_stats,
        "opt_state": template.opt_state,
    }
    restored = serialization.from_bytes(target, data)
    return template.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
