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
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


class EmaTracker:
    """decay=0.999: ~1000-step averaging horizon. Initialized at the first
    iterate (no zero-debias needed)."""

    def __init__(self, params: Any, decay: float = 0.999):
        if not (0.0 < decay < 1.0):
            raise ValueError(f"decay must be in (0, 1); got {decay}")
        self.decay = float(decay)
        self.count = 0
        self.params = jax.tree.map(jnp.asarray, params)
        d = self.decay

        @jax.jit
        def _lerp(ema, new):
            return jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                                ema, new)

        self._lerp = _lerp

    def update(self, params: Any) -> None:
        self.params = self._lerp(self.params, params)
        self.count += 1

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
