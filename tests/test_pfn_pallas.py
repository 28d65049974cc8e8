"""Fused Pallas PFN kernel vs the flax PillarFeatureNet (interpret mode on
the CPU backend; the identical kernel compiles for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.models.pfn import PillarFeatureNet
from tpu_pillars.ops.pfn_pallas import fold_bn, pfn_fused

CFG = tiny_config()


def _random_inputs(rng, P=300, N=16, D=9):
    feats = rng.normal(0, 1, (P, N, D)).astype(np.float32)
    mask = rng.uniform(size=(P, N)) < 0.7
    mask[:, 0] = True            # most pillars have at least one point
    mask[5] = False              # ... but some are fully empty
    mask[17] = False
    feats = feats * mask[..., None]
    return jnp.asarray(feats), jnp.asarray(mask)


def _random_bn(rng, C):
    return (
        jnp.asarray(rng.normal(0, 0.5, (9, C)).astype(np.float32)),   # W
        jnp.asarray(rng.normal(1, 0.2, (C,)).astype(np.float32)),     # scale
        jnp.asarray(rng.normal(0, 0.2, (C,)).astype(np.float32)),     # bias
        jnp.asarray(rng.normal(0, 0.2, (C,)).astype(np.float32)),     # mean
        jnp.asarray(np.abs(rng.normal(1, 0.2, (C,))).astype(np.float32) + 0.1),
    )


def test_kernel_matches_flax_pfn(rng):
    C = 32
    feats, mask = _random_inputs(rng)
    W, scale, bias, mean, var = _random_bn(rng, C)

    pfn = PillarFeatureNet(channels=C, use_running_average=True)
    variables = {
        "params": {"linear": {"kernel": W},
                   "bn": {"scale": scale, "bias": bias}},
        "batch_stats": {"bn": {"mean": mean, "var": var}},
    }
    want = pfn.apply(variables, feats, mask)

    Wf, bf = fold_bn(W, scale, bias, mean, var)
    got = pfn_fused(feats, mask, Wf, bf, block=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_handles_nondivisible_p(rng):
    """P=300 with block=128 needs internal padding; padded pillars must not
    leak into outputs."""
    C = 16
    feats, mask = _random_inputs(rng, P=300)
    W, scale, bias, mean, var = _random_bn(rng, C)
    Wf, bf = fold_bn(W, scale, bias, mean, var)
    full = pfn_fused(feats, mask, Wf, bf, block=128)
    small = pfn_fused(feats, mask, Wf, bf, block=50)
    assert full.shape == (300, C)
    np.testing.assert_allclose(np.asarray(full), np.asarray(small), atol=1e-6)


def test_empty_pillars_output_zero(rng):
    C = 16
    feats, mask = _random_inputs(rng)
    W, scale, bias, mean, var = _random_bn(rng, C)
    Wf, bf = fold_bn(W, scale, bias, mean, var)
    out = np.asarray(pfn_fused(feats, mask, Wf, bf, block=64))
    np.testing.assert_allclose(out[5], 0.0)
    np.testing.assert_allclose(out[17], 0.0)
