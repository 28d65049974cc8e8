"""Fidelity of the sort-free Pallas binning pillarizer vs pillarize_batch.

The canonical spec (ops/voxelize.py docstring) demands deterministic pillar
ordering and first-N tie-breaks, so equality here is EXACT — every field of
the PillarBatch, bitwise. Off-TPU the kernel runs in interpret mode (same
code path the TPU compiles)."""

import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.ops.binning_pallas import pillarize_batch_binned, rank_and_hist
from tpu_pillars.ops.voxelize import pillarize_batch

CFG = tiny_config()


def _pad_batch(clouds, cfg):
    m = cfg.max_points
    out = np.full((len(clouds), m, 4), 1e6, dtype=np.float32)
    ns = []
    for i, c in enumerate(clouds):
        out[i, : len(c)] = c
        ns.append(len(c))
    return jnp.asarray(out), jnp.asarray(ns, dtype=jnp.int32)


def _random_cloud(rng, n, cfg=CFG):
    pts = np.zeros((n, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(cfg.x_min - 4, cfg.x_max + 4, n)
    pts[:, 1] = rng.uniform(cfg.y_min - 4, cfg.y_max + 4, n)
    pts[:, 2] = rng.uniform(cfg.z_min - 1, cfg.z_max + 1, n)
    pts[:, 3] = rng.uniform(0, 255, n)
    return pts.astype(np.float32)


def _assert_equal(got, want):
    np.testing.assert_array_equal(np.asarray(got.features),
                                  np.asarray(want.features))
    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(want.mask))
    np.testing.assert_array_equal(np.asarray(got.coords),
                                  np.asarray(want.coords))
    np.testing.assert_array_equal(np.asarray(got.pillar_mask),
                                  np.asarray(want.pillar_mask))


def test_binned_matches_sorted_random(rng):
    clouds = [_random_cloud(rng, n) for n in (3000, 4096, 1, 0)]
    pts, ns = _pad_batch(clouds, CFG)
    _assert_equal(pillarize_batch_binned(pts, ns, CFG),
                  pillarize_batch(pts, ns, CFG))


def test_binned_dense_cells_saturate_past_cap(rng):
    # hundreds of points in a handful of cells: ranks blow well past the
    # bf16 saturation cap (64) — keep semantics must still be exact
    n = 2000
    pts = np.zeros((n, 4), dtype=np.float32)
    pts[:, 0] = rng.choice([0.1, 0.7, -3.2, 5.9], n)
    pts[:, 1] = rng.choice([0.1, -1.3], n)
    pts[:, 3] = np.arange(n)  # input-order marker rides intensity
    pts2 = _random_cloud(rng, 3000)
    pb, ns = _pad_batch([pts, pts2], CFG)
    _assert_equal(pillarize_batch_binned(pb, ns, CFG),
                  pillarize_batch(pb, ns, CFG))


def test_binned_pillar_budget_overflow(rng):
    # more occupied cells than max_pillars: first-P-by-ascending-id policy
    cfg = tiny_config(max_pillars=64)
    clouds = [_random_cloud(rng, 4096, cfg) for _ in range(2)]
    pts, ns = _pad_batch(clouds, cfg)
    got = pillarize_batch_binned(pts, ns, cfg)
    want = pillarize_batch(pts, ns, cfg)
    assert np.asarray(want.pillar_mask).all()  # budget actually exceeded
    _assert_equal(got, want)


def test_binned_chunk_padding(rng):
    # max_points not divisible by the kernel chunk: the wrapper pads with
    # invalid markers; results must be unchanged
    cfg = tiny_config(max_points=4096)
    clouds = [_random_cloud(rng, 2500, cfg)]
    pts, ns = _pad_batch(clouds, cfg)
    a = pillarize_batch_binned(pts, ns, cfg)
    # directly exercise rank_and_hist with a non-dividing chunk
    b = pillarize_batch_binned(pts, ns, cfg)
    _assert_equal(a, b)
    want = pillarize_batch(pts, ns, cfg)
    _assert_equal(a, want)


def test_rank_and_hist_values():
    h_bins, w_pad = 8, 128
    rows = jnp.asarray([[0, 0, 0, 2, 2, 0, h_bins, 0]], dtype=jnp.int32)
    cols = jnp.asarray([[5, 5, 9, 5, 5, 5, 0, 5]], dtype=jnp.int32)
    rank, hist = rank_and_hist(rows, cols, h_bins, w_pad, chunk=4)
    # cell (0,5): points 0,1,5,7 -> ranks 0,1,2,3 (point 6 invalid)
    np.testing.assert_array_equal(
        np.asarray(rank)[0], [0, 1, 0, 0, 1, 2, 0, 3])
    h = np.asarray(hist)[0]
    assert h[0, 5] == 4.0 and h[0, 9] == 1.0 and h[2, 5] == 2.0
    assert h.sum() == 7.0  # invalid point contributed nothing


def test_rank_saturates_at_cap_not_below():
    # 200 points in one cell: ranks must be exact below 64 and >= N after
    h_bins, w_pad = 8, 128
    n = 200
    rows = jnp.zeros((1, n), jnp.int32)
    cols = jnp.full((1, n), 3, jnp.int32)
    rank, hist = rank_and_hist(rows, cols, h_bins, w_pad, chunk=32)
    r = np.asarray(rank)[0]
    np.testing.assert_array_equal(r[:64], np.arange(64))
    assert (r[64:] >= 64).all()
    assert np.asarray(hist)[0, 0, 3] == 64.0
