"""Fidelity of the window-emit pillarizer vs pillarize_batch — exact, every
field, like test_binning_pallas. Extra attention to ring-window edges:
segments spanning chunk boundaries, pillar-budget overflow mid-stream, empty
samples, and counts past the per-pillar cap."""

import pytest
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.ops.emit_pallas import pillarize_batch_emit
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
    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(want.mask))
    np.testing.assert_array_equal(np.asarray(got.coords),
                                  np.asarray(want.coords))
    np.testing.assert_array_equal(np.asarray(got.pillar_mask),
                                  np.asarray(want.pillar_mask))
    np.testing.assert_array_equal(np.asarray(got.features),
                                  np.asarray(want.features))


def test_emit_matches_sorted_random(rng):
    clouds = [_random_cloud(rng, n) for n in (3000, 4096, 1, 0)]
    pts, ns = _pad_batch(clouds, CFG)
    _assert_equal(pillarize_batch_emit(pts, ns, CFG),
                  pillarize_batch(pts, ns, CFG))


def test_emit_segment_spans_many_chunks(rng):
    # 900 points in one cell (>3 kernel chunks of 256) plus scatter around:
    # the open-segment carry and the no-flush-of-open-row guard get exercised
    n = 900
    dense = np.zeros((n, 4), dtype=np.float32)
    dense[:, 0] = 0.1
    dense[:, 1] = 0.1
    dense[:, 3] = np.arange(n)
    rest = _random_cloud(rng, 3000)
    pts, ns = _pad_batch([np.concatenate([dense, rest]),
                          _random_cloud(rng, 2000)], CFG)
    _assert_equal(pillarize_batch_emit(pts, ns, CFG),
                  pillarize_batch(pts, ns, CFG))


def test_emit_pillar_budget_overflow(rng):
    cfg = tiny_config(max_pillars=64)
    clouds = [_random_cloud(rng, 4096, cfg) for _ in range(2)]
    pts, ns = _pad_batch(clouds, cfg)
    got = pillarize_batch_emit(pts, ns, cfg)
    want = pillarize_batch(pts, ns, cfg)
    assert np.asarray(want.pillar_mask).all()  # budget actually exceeded
    _assert_equal(got, want)


def test_emit_low_occupancy_window_drain(rng):
    # very few pillars: the drain must pump zero halves through the whole
    # (P,) table tail after the last flush of real rows
    pts_small = np.array([[0.1, 0.1, 0.0, 1.0], [5.0, -3.0, 0.5, 2.0]],
                         dtype=np.float32)
    pts, ns = _pad_batch([pts_small], CFG)
    got = pillarize_batch_emit(pts, ns, CFG)
    want = pillarize_batch(pts, ns, CFG)
    assert int(np.asarray(got.pillar_mask).sum()) == 2
    _assert_equal(got, want)


def test_emit_multisweep_five_features(rng):
    # num_sweeps > 1 adds the dt channel: F=5, lane dim 160 -> padded 256
    cfg = tiny_config(num_sweeps=2)
    n = 3000
    pts = np.zeros((n, 5), dtype=np.float32)
    pts[:, 0] = rng.uniform(cfg.x_min - 2, cfg.x_max + 2, n)
    pts[:, 1] = rng.uniform(cfg.y_min - 2, cfg.y_max + 2, n)
    pts[:, 2] = rng.uniform(cfg.z_min, cfg.z_max, n)
    pts[:, 3] = rng.uniform(0, 255, n)
    pts[:, 4] = rng.choice([0.0, 0.1], n)
    out = np.full((1, cfg.max_points, 5), 1e6, np.float32)
    out[0, :n] = pts
    pj = jnp.asarray(out)
    ns = jnp.asarray([n], jnp.int32)
    _assert_equal(pillarize_batch_emit(pj, ns, cfg),
                  pillarize_batch(pj, ns, cfg))


@pytest.mark.slow
def test_emit_knob_variants_bit_equal(rng):
    """The (k, whalf, wblk, gate_dead) tuning knobs must never change the
    output: every variant is the same canonical spec. Includes an empty
    sample and a padded tail (dead chunks) so the gate path is exercised."""
    from tpu_pillars.ops.emit_pallas import (
        emit_pillar_table, sort_points_by_pillar,
    )

    clouds = [_random_cloud(rng, n) for n in (3000, 0, 4096, 700)]
    pts, ns = _pad_batch(clouds, CFG)
    gid, ps = sort_points_by_pillar(pts, ns, CFG)
    N, F = CFG.max_points_per_pillar, 4
    P, HW = CFG.max_pillars, CFG.grid_h * CFG.grid_w
    ref_t, ref_m = emit_pillar_table(gid, ps, N, F, P, HW)
    for kn in (dict(gate_dead=False), dict(whalf=2048), dict(wblk=128),
               dict(k=2048, whalf=2048), dict(wblk=512, gate_dead=False)):
        t, m = emit_pillar_table(gid, ps, N, F, P, HW, **kn)
        pmin = min(t.shape[1], ref_t.shape[1])
        np.testing.assert_array_equal(np.asarray(t[:, :pmin]),
                                      np.asarray(ref_t[:, :pmin]))
        np.testing.assert_array_equal(np.asarray(m[:, :, :pmin]),
                                      np.asarray(ref_m[:, :, :pmin]))
