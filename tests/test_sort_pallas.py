"""Bitonic sort kernel (ops/sort_pallas.py) == the lax.sort production path,
bit-for-bit: same stable order (lexicographic (key, index) comparator is
exactly stable-sort), same payload rows, at power-of-two and padded
(non-power-of-two) per-sample sizes, with and without payload carry."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.ops.emit_pallas import sort_points_by_pillar
from tpu_pillars.ops.sort_pallas import sort_points_by_pillar_bitonic


def _scene_points(rng, cfg, b, m, frac_out=0.2):
    pts = np.zeros((b, m, 4), np.float32)
    pts[..., 0] = rng.uniform(cfg.x_min - 10, cfg.x_max + 10, (b, m))
    pts[..., 1] = rng.uniform(cfg.y_min - 10, cfg.y_max + 10, (b, m))
    pts[..., 2] = rng.uniform(cfg.z_min - 1, cfg.z_max + 1, (b, m))
    pts[..., 3] = rng.uniform(0, 1, (b, m))
    # heavy duplicates: many points per pillar to exercise stability
    narrow = rng.integers(0, 2, (b, m)).astype(bool)
    pts[..., 0] = np.where(
        narrow, np.float32(cfg.x_min + 1.0), pts[..., 0])
    n = rng.integers(int(m * (1 - frac_out)), m + 1, (b,)).astype(np.int32)
    return jnp.asarray(pts), jnp.asarray(n)


@pytest.mark.parametrize("carry", [True, False])
@pytest.mark.parametrize("m", [1024, 1536])  # pow2 and padded (->2048)
def test_bitonic_matches_lax_sort(rng, carry, m):
    cfg = tiny_config()
    pts, n = _scene_points(rng, cfg, b=2, m=m)
    ref_k, ref_p = sort_points_by_pillar(pts, n, cfg)
    got_k, got_p = sort_points_by_pillar_bitonic(pts, n, cfg,
                                                 carry_payload=carry)
    np.testing.assert_array_equal(np.asarray(ref_k), np.asarray(got_k))
    np.testing.assert_array_equal(np.asarray(ref_p), np.asarray(got_p))


def test_bitonic_all_invalid(rng):
    cfg = tiny_config()
    pts, _ = _scene_points(rng, cfg, b=1, m=1024)
    n = jnp.zeros((1,), jnp.int32)  # empty cloud
    ref_k, ref_p = sort_points_by_pillar(pts, n, cfg)
    got_k, got_p = sort_points_by_pillar_bitonic(pts, n, cfg)
    np.testing.assert_array_equal(np.asarray(ref_k), np.asarray(got_k))
    np.testing.assert_array_equal(np.asarray(ref_p), np.asarray(got_p))
