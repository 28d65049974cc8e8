"""Train state: params + BN batch_stats + optimizer state, as one pytree
(the TPU-native replacement for the reference's torch Module/optimizer pair,
SURVEY.md L4)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpu_pillars.config import PillarsConfig
from tpu_pillars.models.pointpillars import PointPillars
from tpu_pillars.ops.voxelize import PillarBatch


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-4
    weight_decay: float = 1e-4
    grad_clip_norm: float = 10.0
    total_steps: int = 10000
    warmup_frac: float = 0.1
    max_gt_boxes: int = 64   # static GT padding per sweep
    batch_size: int = 8
    # "float32" or "bfloat16": model-activation dtype for the train step
    # (mixed precision; params/opt state/BN stats/losses stay float32)
    compute_dtype: str = "float32"


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """Adam + one-cycle-style schedule (the reference lineage's standard
    recipe) with global gradient clipping and decoupled weight decay.

    Built as explicit linear-warmup + cosine-decay: optax's
    cosine_onecycle_schedule emits NaN learning rates whenever
    total_steps * warmup_frac < 1 (zero-length piecewise segment ->
    divide-by-zero), which silently NaN'd short runs."""
    warmup = max(1, int(round(tcfg.total_steps * tcfg.warmup_frac)))
    decay = max(1, tcfg.total_steps - warmup)
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(tcfg.learning_rate / 25.0,
                                  tcfg.learning_rate, warmup),
            optax.cosine_decay_schedule(tcfg.learning_rate, decay,
                                        alpha=1e-4),
        ],
        boundaries=[warmup],
    )
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip_norm),
        optax.adamw(schedule, weight_decay=tcfg.weight_decay),
    )


def create_train_state(config: PillarsConfig, tcfg: TrainConfig,
                       rng_key=None) -> TrainState:
    model = PointPillars(config)  # init shapes are mode-independent
    dummy = PillarBatch(
        jnp.zeros((config.max_pillars, config.max_points_per_pillar,
                   config.num_decorated_features)),
        jnp.zeros((config.max_pillars, config.max_points_per_pillar), bool),
        jnp.zeros((config.max_pillars, 2), jnp.int32),
        jnp.zeros((config.max_pillars,), bool),
    )
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    variables = model.init(rng_key, dummy)
    tx = make_optimizer(tcfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
