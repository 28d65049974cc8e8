"""PillarFeatureNet: per-point Dense -> masked BatchNorm -> ReLU -> masked
max-pool over the points of each pillar (SURVEY.md section 2 'PFN';
PointPillars paper section 2.1).

TPU notes: the (P, N, D) -> (P, N, C) dense layer is one big (P*N, D) x (D, C)
matmul — MXU work. The masked max is a VPU reduction. BatchNorm statistics are
computed over *valid points only* (SURVEY.md section 7 hard part d: padded
pillars must not pollute BN stats — the reference lineage gets this subtly
wrong by including padding rows).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the channel axis whose batch statistics ignore masked
    rows. Running stats live in the 'batch_stats' collection (same contract
    as flax.linen.BatchNorm).

    axis_name: when set and running under shard_map/pmap, the masked count
    and moment sums are psum'ed over that mesh axis — global-batch (sync-BN)
    statistics from per-device shards, matching what GSPMD computes
    automatically from the global view."""

    use_running_average: bool = True
    momentum: float = 0.99
    eps: float = 1e-3
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask):
        """x: (..., C); mask: (...,) bool — rows that count toward stats."""
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            fmask = mask[..., None].astype(jnp.float32)
            count = jnp.sum(fmask)
            xf = x.astype(jnp.float32)
            mean_num = jnp.sum(xf * fmask, axis=reduce_axes)
            sync = (self.axis_name is not None
                    and not self.is_initializing())
            if sync:
                count, mean_num = jax.lax.psum((count, mean_num),
                                               self.axis_name)
            count = jnp.maximum(count, 1.0)
            mean = mean_num / count
            var_num = jnp.sum((xf - mean) ** 2 * fmask, axis=reduce_axes)
            if sync:
                var_num = jax.lax.psum(var_num, self.axis_name)
            var = var_num / count
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class PillarFeatureNet(nn.Module):
    """(..., P, N, D), mask (..., P, N) -> (..., P, C) pillar features.
    Works unbatched or with any leading batch dims (BN stats pool over all)."""

    channels: int = 64
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, features, mask):
        x = nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                     name="linear")(features)
        x = MaskedBatchNorm(use_running_average=self.use_running_average,
                            dtype=self.dtype, axis_name=self.axis_name,
                            name="bn")(x, mask)
        x = nn.relu(x)
        # masked max over the point axis; empty pillars -> 0
        neg = jnp.asarray(-1e9, x.dtype)
        x = jnp.where(mask[..., None], x, neg)
        x = jnp.max(x, axis=-2)
        any_valid = jnp.any(mask, axis=-1)[..., None]
        return jnp.where(any_valid, x, 0.0)
