"""Fused Pallas PFN kernel (SURVEY.md section 7 step 3 tier; the 'native
kernel' replacing the reference lineage's per-point torch ops).

The XLA PillarFeatureNet materializes the (P, N, C) post-linear activation in
HBM (~98 MB at the full 12k x 32 x 64 operating point) before the max-pool
reads it back. This kernel fuses linear + folded-BN + ReLU + masked max over
the points axis in VMEM, one pillar-block per grid step:

    HBM traffic:  read (P, N, D) feats + masks, write (P, C) features
                  — the (P, N, C) intermediate never exists.

Inference-mode BatchNorm is affine, so it folds into the matmul:
    relu(BN(x @ W)) = relu(x @ W' + b'),  W' = W * (g / sqrt(v + eps)),
                                          b' = beta - m * g / sqrt(v + eps).

The MXU sees one (BLOCK*N, D) x (D, C) matmul per grid step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(weight, scale, bias, mean, var, eps: float = 1e-3):
    """Fold inference BatchNorm into the PFN linear. weight (D, C)."""
    inv = scale * jax.lax.rsqrt(var + eps)
    return weight * inv[None, :], bias - mean * inv


def _pfn_kernel(feats_ref, mask_ref, w_ref, b_ref, out_ref, *, n_pts: int):
    block = feats_ref.shape[0]
    d = feats_ref.shape[2]
    c = w_ref.shape[1]
    x = feats_ref[:].reshape(block * n_pts, d)
    y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b_ref[:], 0.0)                  # bias + ReLU
    y = y.reshape(block, n_pts, c)
    m = mask_ref[:][..., None]                          # (block, n, 1) f32
    y = jnp.where(m > 0.0, y, -1e9)
    pooled = jnp.max(y, axis=1)                         # (block, c)
    any_valid = jnp.max(mask_ref[:], axis=1)[:, None]   # (block, 1)
    out_ref[:] = jnp.where(any_valid > 0.0, pooled, 0.0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pfn_fused(features, mask, weight, bias, block: int = 128,
              interpret: bool | None = None):
    """features (P, N, D) f32, mask (P, N) bool, folded weight (D, C) /
    bias (C,) -> pillar features (P, C) f32.

    P is padded up to a multiple of `block` internally. `interpret` defaults
    to True off-TPU so the same tests run on the CPU backend.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P, N, D = features.shape
    C = weight.shape[1]
    block = min(block, P)
    P_pad = ((P + block - 1) // block) * block
    if P_pad != P:
        features = jnp.concatenate(
            [features, jnp.zeros((P_pad - P, N, D), features.dtype)], axis=0)
        mask = jnp.concatenate(
            [mask, jnp.zeros((P_pad - P, N), mask.dtype)], axis=0)

    out = pl.pallas_call(
        functools.partial(_pfn_kernel, n_pts=N),
        grid=(P_pad // block,),
        in_specs=[
            pl.BlockSpec((block, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_pad, C), jnp.float32),
        interpret=interpret,
    )(features.astype(jnp.float32), mask.astype(jnp.float32),
      weight.astype(jnp.float32), bias.reshape(1, C).astype(jnp.float32))
    return out[:P]
