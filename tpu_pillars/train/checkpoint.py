"""Checkpoint save/restore (SURVEY.md section 5 'Checkpoint / resume'):
params + batch_stats + opt_state + step as one msgpack file via flax
serialization — the functional-pytree replacement for torch.save(state_dict).
Writes are atomic (tmp file + rename) so an interrupted save never corrupts
the previous checkpoint.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import tempfile


import numpy as np
from flax import serialization

from tpu_pillars.train.state import TrainState


def config_fingerprint(config) -> np.ndarray:
    """Stable 8-byte digest of a PillarsConfig — stored in checkpoints so a
    restore against the wrong config fails with a clear message instead of
    a shape mismatch deep inside flax deserialization."""
    text = repr(sorted(dataclasses.asdict(config).items())).encode()
    return np.frombuffer(hashlib.sha256(text).digest()[:8], np.uint8).copy()


def save_checkpoint(path: str, state: TrainState, config=None) -> None:
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    if config is not None:
        payload["config_fp"] = config_fingerprint(config)
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


def export_inference_checkpoint(path: str, state_or_ckpt, config=None
                                ) -> None:
    """Write a serving artifact: params + batch_stats (+ config_fp) WITHOUT
    the optimizer state — ~3x smaller than a train checkpoint (AdamW keeps
    two moments per param). Loads through Detector.from_checkpoint
    unchanged (it reads only the variable subtrees); restore_checkpoint
    will correctly REFUSE it (no opt_state — it is not a resume point).

    state_or_ckpt: a TrainState, or a path to a full train checkpoint to
    strip host-side (no model build needed)."""
    if isinstance(state_or_ckpt, (str, os.PathLike)):
        with open(state_or_ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        payload = {"step": raw["step"], "params": raw["params"],
                   "batch_stats": raw["batch_stats"]}
        if config is not None:
            payload["config_fp"] = config_fingerprint(config)
        elif "config_fp" in raw:
            payload["config_fp"] = np.asarray(raw["config_fp"], np.uint8)
    else:
        payload = {"step": state_or_ckpt.step,
                   "params": state_or_ckpt.params,
                   "batch_stats": state_or_ckpt.batch_stats}
        if config is not None:
            payload["config_fp"] = config_fingerprint(config)
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


def restore_checkpoint(path: str, template: TrainState,
                       config=None) -> TrainState:
    """Restore into the structure of `template` (same config/optimizer).

    If `config` is given and the checkpoint recorded a fingerprint, a
    mismatch raises ValueError up front."""
    with open(path, "rb") as f:
        data = f.read()
    raw = serialization.msgpack_restore(data)
    if config is not None and "config_fp" in raw:
        want = config_fingerprint(config)
        got = np.asarray(raw["config_fp"], np.uint8)
        if not np.array_equal(want, got):
            raise ValueError(
                f"checkpoint {path} was written for a different "
                f"PillarsConfig (fingerprint {got.tobytes().hex()} != "
                f"{want.tobytes().hex()}); refusing to restore")
    target = {
        "step": template.step,
        "params": template.params,
        "batch_stats": template.batch_stats,
        "opt_state": template.opt_state,
    }
    if "config_fp" in raw:
        target["config_fp"] = config_fingerprint(config) if config is not None \
            else np.zeros(8, np.uint8)
    restored = serialization.from_bytes(target, data)
    return template.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
