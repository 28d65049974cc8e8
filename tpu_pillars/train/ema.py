"""Exponential moving average of the model parameters.

Standard kit in the SECOND/PointPillars training lineage (SURVEY.md §2
training-loop row [K]): evaluating/serving the EMA of the weights instead
of the last iterate smooths optimizer noise and typically buys a fraction
of a point of mAP late in training. Kept OUT of the jitted train step on
purpose: the tracker is one tiny jitted lerp over the param tree per step
(~5 M params — sub-ms), it composes unchanged with GSPMD/shard_map DP
(params are replicated), and the step function and its checkpoints stay
bit-identical whether EMA is on or off (tests pin the existing resume
bit-equality either way).

BatchNorm running statistics are already EMAs of batch moments; the
tracker therefore averages `params` only and serves the LATEST
`batch_stats` alongside (the standard recipe).

Decay warmup (default on): the effective decay at update n (1-based) is
``min(decay, (1 + n) / (10 + n))`` — the TF-models/timm schedule. A fixed
decay of 0.999 weights the random init and the first few hundred
iterates so heavily that short runs serve garbage: a 1500-step full-size
run measured raw mAP 0.41 vs EMA mAP 0.002 (2026-08-19, /tmp/trainrun8).
With warmup the early EMA is close to a running mean and converges to
the fixed decay at n >> 10; the same 1500-step run re-measured (raw
training is seed-deterministic — its mAP curve reproduced bit-for-bit)
EMA mAP 0.41 vs raw 0.41 at step 1500, and 0.380 vs 0.342 at step 1000.
``warmup=False`` restores the fixed-decay behavior.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


class EmaTracker:
    """decay=0.999: ~1000-step averaging horizon (once past warmup).
    Initialized at the first iterate (no zero-debias needed)."""

    def __init__(self, params: Any, decay: float = 0.999,
                 warmup: bool = True):
        if not (0.0 < decay < 1.0):
            raise ValueError(f"decay must be in (0, 1); got {decay}")
        self.decay = float(decay)
        self.warmup = bool(warmup)
        self.count = 0
        self.params = jax.tree.map(jnp.asarray, params)

        @jax.jit
        def _lerp(ema, new, d):
            # d is a traced scalar: the warmup schedule changes it every
            # step without recompiling
            return jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                                ema, new)

        self._lerp = _lerp

    def _decay_at(self, n: int) -> float:
        """Effective decay for 1-based update n."""
        if not self.warmup:
            return self.decay
        return min(self.decay, (1.0 + n) / (10.0 + n))

    def update(self, params: Any) -> None:
        self.count += 1
        d = jnp.float32(self._decay_at(self.count))
        self.params = self._lerp(self.params, params, d)

    def variables(self, batch_stats: Any) -> dict:
        """Inference variables: EMA params + the caller's (latest) BN
        running statistics."""
        return {"params": self.params, "batch_stats": batch_stats}

    def swap_into(self, state):
        """A TrainState view with EMA params (for eval_fn / export); the
        optimizer state is untouched — do NOT resume training from it."""
        return state.replace(params=self.params)


def maybe_tracker(params: Any, decay: float) -> Optional[EmaTracker]:
    """CLI helper: decay <= 0 disables EMA."""
    return EmaTracker(params, decay) if decay and decay > 0.0 else None
