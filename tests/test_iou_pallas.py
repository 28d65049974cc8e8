"""Tiled Pallas rotated-IoU kernel vs the XLA Green's-theorem path and the
Sutherland–Hodgman float64 oracle (interpret mode on CPU; the same kernel
compiles for real on TPU)."""

import jax.numpy as jnp
import numpy as np

from tpu_pillars.ops.iou import rotated_iou_bev
from tpu_pillars.ops.iou_pallas import rotated_iou_bev_tiled
from tpu_pillars.reference_cpu.postprocess import rotated_iou_bev_np


def _random_boxes(rng, n, span=8.0):
    b = np.zeros((n, 7), dtype=np.float32)
    b[:, 0:2] = rng.uniform(-span, span, (n, 2))
    b[:, 2] = rng.uniform(-1, 1, n)
    b[:, 3] = rng.uniform(0.5, 3.0, n)
    b[:, 4] = rng.uniform(0.5, 6.0, n)
    b[:, 5] = rng.uniform(0.5, 3.0, n)
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_kernel_matches_xla_path(rng):
    b1 = _random_boxes(rng, 50)
    b2 = _random_boxes(rng, 37)
    got = np.asarray(rotated_iou_bev_tiled(jnp.asarray(b1), jnp.asarray(b2),
                                           block_i=32, block_j=32))
    want = np.asarray(rotated_iou_bev(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, atol=1e-3)  # per-tile vs per-pair recentering noise


def test_kernel_matches_float64_oracle(rng):
    b1 = _random_boxes(rng, 20, span=5.0)
    b2 = _random_boxes(rng, 15, span=5.0)
    got = np.asarray(rotated_iou_bev_tiled(jnp.asarray(b1), jnp.asarray(b2),
                                           block_i=16, block_j=16))
    want = rotated_iou_bev_np(b1, b2)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_kernel_self_iou_and_disjoint(rng):
    b = _random_boxes(rng, 24)
    iou = np.asarray(rotated_iou_bev_tiled(jnp.asarray(b), jnp.asarray(b),
                                           block_i=24, block_j=24))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)
    far = b.copy()
    far[:, 0] += 1000.0
    z = np.asarray(rotated_iou_bev_tiled(jnp.asarray(b), jnp.asarray(far),
                                         block_i=24, block_j=24))
    np.testing.assert_allclose(z, 0.0, atol=1e-6)


def test_kernel_nondivisible_padding(rng):
    b1 = _random_boxes(rng, 45)   # pads to 64 at block 32
    b2 = _random_boxes(rng, 19)
    got = np.asarray(rotated_iou_bev_tiled(jnp.asarray(b1), jnp.asarray(b2),
                                           block_i=32, block_j=16))
    assert got.shape == (45, 19)
    want = np.asarray(rotated_iou_bev(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, atol=1e-3)  # per-tile vs per-pair recentering noise
