"""Streaming table-free front end (ops/stream_pfn.py) vs the fused-table
oracle: same algebra (fold_decoration weights, masked max, decoration bias),
different reduction order — parity pinned to tight tolerance; knob settings
pinned bit-equal to each other."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.config import PillarsConfig, tiny_config
from tpu_pillars.ops.fused_pfn import pillarize_pfn_fused
from tpu_pillars.ops.stream_pfn import points_to_canvas_stream
from tpu_pillars.ops.voxelize import scatter_to_bev


def _rand_points(rng, cfg: PillarsConfig, b, n_live, hot_cells=0):
    """Random in-range clouds; optionally dump extra points into a few hot
    cells to exercise the kept-points cap."""
    M = cfg.max_points
    F = cfg.num_input_features
    pts = np.zeros((b, M, F), np.float32)
    pts[..., 0] = rng.uniform(cfg.x_min * 1.1, cfg.x_max * 1.1, (b, M))
    pts[..., 1] = rng.uniform(cfg.y_min * 1.1, cfg.y_max * 1.1, (b, M))
    pts[..., 2] = rng.uniform(cfg.z_min * 1.2, cfg.z_max * 1.2, (b, M))
    for f in range(3, F):
        pts[..., f] = rng.uniform(0.0, 1.0, (b, M))
    if hot_cells:
        n_hot = min(8 * cfg.max_points_per_pillar, n_live // 2)
        for i in range(b):
            for h in range(hot_cells):
                cx = rng.uniform(cfg.x_min + 1, cfg.x_max - 1)
                cy = rng.uniform(cfg.y_min + 1, cfg.y_max - 1)
                sl = slice(h * n_hot, (h + 1) * n_hot)
                pts[i, sl, 0] = cx + rng.uniform(-0.1, 0.1, n_hot)
                pts[i, sl, 1] = cy + rng.uniform(-0.1, 0.1, n_hot)
    num = np.full((b,), n_live, np.int32)
    return jnp.asarray(pts), jnp.asarray(num)


def _rand_weights(rng, cfg: PillarsConfig):
    D = cfg.num_input_features + 5
    C = cfg.pfn_channels
    w = jnp.asarray(rng.standard_normal((D, C)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    return w, b


def _oracle_canvas(points, num, w, b, cfg):
    feats, pid, pmask = pillarize_pfn_fused(points, num, w, b, cfg,
                                            interpret=True)
    W = cfg.grid_w
    coords = jnp.stack([pid // W, pid % W], axis=-1) * pmask[..., None]
    return scatter_to_bev(feats, coords, pmask, cfg)


@pytest.mark.parametrize("hot_cells", [0, 3])
def test_stream_canvas_matches_fused_table_path(hot_cells):
    cfg = tiny_config()
    rng = np.random.default_rng(0 if hot_cells == 0 else 1)
    points, num = _rand_points(rng, cfg, b=2, n_live=3000,
                               hot_cells=hot_cells)
    w, b = _rand_weights(rng, cfg)
    got = points_to_canvas_stream(points, num, w, b, cfg, interpret=True)
    ref = _oracle_canvas(points, num, w, b, cfg)
    assert got.shape == ref.shape == (2, cfg.grid_h, cfg.grid_w,
                                      cfg.pfn_channels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-6, atol=5e-6)
    # occupancy identical: zero cells exactly where the oracle has them
    occ_g = np.any(np.asarray(got) != 0.0, axis=-1)
    occ_r = np.any(np.asarray(ref) != 0.0, axis=-1)
    assert occ_g.sum() > 50
    np.testing.assert_array_equal(occ_g, occ_r)


def test_stream_canvas_budget_overflow():
    """More occupied cells than max_pillars: dropped pillars' cells must be
    zero, kept pillars identical to the oracle."""
    cfg = tiny_config(max_pillars=64)
    rng = np.random.default_rng(2)
    points, num = _rand_points(rng, cfg, b=2, n_live=2000)
    w, b = _rand_weights(rng, cfg)
    got = points_to_canvas_stream(points, num, w, b, cfg, interpret=True)
    ref = _oracle_canvas(points, num, w, b, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-6, atol=5e-6)


def test_stream_canvas_empty_and_tiny_samples():
    cfg = tiny_config()
    rng = np.random.default_rng(3)
    points, _ = _rand_points(rng, cfg, b=3, n_live=100)
    num = jnp.asarray([0, 1, 100], jnp.int32)
    w, b = _rand_weights(rng, cfg)
    got = points_to_canvas_stream(points, num, w, b, cfg, interpret=True)
    ref = _oracle_canvas(points, num, w, b, cfg)
    assert not np.any(np.asarray(got[0]))          # empty sample -> zeros
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-6, atol=5e-6)


def test_stream_canvas_multisweep_features():
    cfg = tiny_config(num_sweeps=2)   # adds the dt channel (F=5)
    assert cfg.num_input_features == 5
    rng = np.random.default_rng(4)
    points, num = _rand_points(rng, cfg, b=2, n_live=1500)
    w, b = _rand_weights(rng, cfg)
    got = points_to_canvas_stream(points, num, w, b, cfg, interpret=True)
    ref = _oracle_canvas(points, num, w, b, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-6, atol=5e-6)


@pytest.mark.slow
def test_stream_canvas_knob_invariance():
    """Every (ck, whalf, wblk, gates) setting computes the identical
    canvas bit-for-bit: each cell is single-source (one pillar, one chunk)
    and the ladder tree is anchored at run starts, not chunk boundaries."""
    cfg = tiny_config()
    rng = np.random.default_rng(5)
    points, num = _rand_points(rng, cfg, b=2, n_live=2500, hot_cells=2)
    w, b = _rand_weights(rng, cfg)
    base = np.asarray(points_to_canvas_stream(
        points, num, w, b, cfg, interpret=True))
    for knobs in (dict(whalf=200), dict(wblk=80),
                  dict(gate_dead=False), dict(gate_blocks=False),
                  dict(ck=2048), dict(whalf=800, wblk=160),
                  dict(lad_mode="fwd")):
        other = np.asarray(points_to_canvas_stream(
            points, num, w, b, cfg, interpret=True, **knobs))
        np.testing.assert_array_equal(base, other), knobs
