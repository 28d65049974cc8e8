"""Fidelity of the dense block-gather BEV canvas builder vs the XLA scatter.
Inputs come from the real pillarizer so the ascending-pillar-id ordering
guarantee the kernel relies on is the one production provides."""

import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.ops.bev_pallas import scatter_to_bev_auto, scatter_to_bev_emit
from tpu_pillars.ops.voxelize import pillarize_batch, scatter_to_bev

CFG = tiny_config()


def _pillars_from_cloud(rng, ns, cfg=CFG):
    pts = np.full((len(ns), cfg.max_points, 4), 1e6, dtype=np.float32)
    for i, n in enumerate(ns):
        pts[i, :n, 0] = rng.uniform(cfg.x_min - 2, cfg.x_max + 2, n)
        pts[i, :n, 1] = rng.uniform(cfg.y_min - 2, cfg.y_max + 2, n)
        pts[i, :n, 2] = rng.uniform(cfg.z_min, cfg.z_max, n)
        pts[i, :n, 3] = rng.uniform(0, 255, n)
    return pillarize_batch(jnp.asarray(pts),
                           jnp.asarray(ns, dtype=jnp.int32), CFG)


def test_bev_emit_matches_scatter(rng):
    batch = _pillars_from_cloud(rng, [3000, 4096, 0])
    B, P = batch.pillar_mask.shape
    C = 32
    feats = jnp.asarray(rng.normal(size=(B, P, C)).astype(np.float32))
    pid = batch.coords[..., 0] * CFG.grid_w + batch.coords[..., 1]
    got = scatter_to_bev_emit(feats, pid, batch.pillar_mask, CFG)
    want = scatter_to_bev(feats, batch.coords, batch.pillar_mask, CFG)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bev_auto_matches_scatter(rng):
    # auto dispatches to the ring kernel on TPU and to the XLA scatter on
    # other backends (this CPU suite exercises the fallback branch); either
    # way the canvas must equal the XLA scatter bit-for-bit
    import jax

    assert jax.default_backend() != "tpu"  # pin which branch this covers
    batch = _pillars_from_cloud(rng, [2500])
    B, P = batch.pillar_mask.shape
    feats = jnp.asarray(rng.normal(size=(B, P, 32)).astype(np.float32))
    got = scatter_to_bev_auto(feats, batch.coords, batch.pillar_mask, CFG)
    want = scatter_to_bev(feats, batch.coords, batch.pillar_mask, CFG)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bev_emit_dense_full_grid(rng):
    # every pillar slot occupied, ids densely packed at the grid start —
    # exercises block boundaries where hi - lo == cells-per-block
    B, P = 2, CFG.max_pillars
    C = 64
    pid = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (B, P))
    mask = jnp.ones((B, P), bool)
    feats = jnp.asarray(rng.normal(size=(B, P, C)).astype(np.float32))
    coords = jnp.stack([pid // CFG.grid_w, pid % CFG.grid_w], axis=-1)
    got = scatter_to_bev_emit(feats, pid, mask, CFG)
    want = scatter_to_bev(feats, coords, mask, CFG)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bev_ring_matches_scatter(rng):
    from tpu_pillars.ops.bev_pallas import scatter_to_bev_ring

    batch = _pillars_from_cloud(rng, [3000, 4096, 0])
    B, P = batch.pillar_mask.shape
    feats = jnp.asarray(rng.normal(size=(B, P, 32)).astype(np.float32))
    pid = batch.coords[..., 0] * CFG.grid_w + batch.coords[..., 1]
    got = scatter_to_bev_ring(feats, pid, batch.pillar_mask, CFG)
    want = scatter_to_bev(feats, batch.coords, batch.pillar_mask, CFG)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bev_ring_dense_and_sparse_extremes(rng):
    from tpu_pillars.ops.bev_pallas import scatter_to_bev_ring

    # dense: every slot occupied with consecutive ids (window always full);
    # sparse: two pillars at opposite grid corners (flush pumps the gap)
    B, P, C = 1, CFG.max_pillars, 64
    pid_dense = jnp.arange(P, dtype=jnp.int32)[None]
    mask = jnp.ones((B, P), bool)
    feats = jnp.asarray(rng.normal(size=(B, P, C)).astype(np.float32))
    coords = jnp.stack([pid_dense // CFG.grid_w, pid_dense % CFG.grid_w], -1)
    got = scatter_to_bev_ring(feats, pid_dense, mask, CFG)
    want = scatter_to_bev(feats, coords, mask, CFG)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    hw = CFG.grid_h * CFG.grid_w
    pid_sparse = jnp.zeros((B, P), jnp.int32).at[0, 0].set(0).at[0, 1].set(hw - 1)
    mask2 = jnp.zeros((B, P), bool).at[0, :2].set(True)
    coords2 = jnp.stack([pid_sparse // CFG.grid_w, pid_sparse % CFG.grid_w], -1)
    got2 = scatter_to_bev_ring(feats, pid_sparse, mask2, CFG)
    want2 = scatter_to_bev(feats, coords2, mask2, CFG)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want2))


def test_bev_ring_knob_variants_bit_equal(rng):
    """(whalf, rchunk) must never change the canvas. The pid pattern mixes
    dense clusters (canvas rows shared across chunk boundaries via cpr
    packing), long gaps (steady-state overwrite rounds with no hits), and
    a padded tail — the shapes the half-overwrite rounds must get right."""
    from tpu_pillars.ops.bev_pallas import scatter_to_bev_ring

    B, C = 2, 32
    hw = CFG.grid_h * CFG.grid_w
    cpr = 128 // C
    hwr = hw // cpr
    # clusters at the start, around the ring midpoint, and at the end;
    # strictly ascending ids within each sample
    ids = np.concatenate([
        np.arange(0, 40),                      # dense head (shared rows)
        np.arange(hw // 2 - 20, hw // 2 + 20),  # mid cluster after a gap
        np.arange(hw - 40, hw),                # tail cluster
    ])
    P = 160
    pid = np.full((B, P), hw, np.int64)
    pid[0, :len(ids)] = ids
    pid[1, :30] = ids[:30] * 2 + 1             # odd ids, different rows
    mask = pid < hw
    feats = rng.normal(size=(B, P, C)).astype(np.float32)
    pid_j = jnp.asarray(pid.astype(np.int32))
    mask_j = jnp.asarray(mask)
    feats_j = jnp.asarray(feats)

    ref = np.asarray(scatter_to_bev_ring(feats_j, pid_j, mask_j, CFG))
    for kn in (dict(whalf=8, rchunk=8), dict(whalf=40, rchunk=16),
               dict(whalf=hwr // 2, rchunk=64),
               dict(whalf=8, rchunk=8, steady_overwrite=True),
               dict(whalf=40, rchunk=16, steady_overwrite=True)):
        if hwr % kn["whalf"]:
            continue
        got = np.asarray(scatter_to_bev_ring(feats_j, pid_j, mask_j, CFG,
                                             **kn))
        np.testing.assert_array_equal(got, ref, err_msg=str(kn))
    coords = jnp.stack([pid_j // CFG.grid_w, pid_j % CFG.grid_w], -1) \
        * mask_j[..., None]
    want = np.asarray(scatter_to_bev(feats_j, coords, mask_j, CFG))
    np.testing.assert_array_equal(ref, want)


def test_ring_diff_grads_match_xla_scatter(rng):
    """scatter_to_bev_ring_diff: forward bit-equal to the XLA scatter and
    custom-VJP cotangents equal to XLA's scatter transpose (the train
    path's dispatcher uses it on TPU; see scatter_to_bev_train_auto)."""
    import jax

    from tpu_pillars.ops.bev_pallas import scatter_to_bev_ring_diff

    batch = _pillars_from_cloud(rng, [1500, 2000])
    B, P = batch.pillar_mask.shape
    C = 64
    feats = jnp.asarray(rng.normal(size=(B, P, C)).astype(np.float32))
    pid = batch.coords[..., 0] * CFG.grid_w + batch.coords[..., 1]
    probe = jnp.asarray(
        rng.normal(size=(B, CFG.grid_h, CFG.grid_w, C)).astype(np.float32))

    def via_ring(f):
        return jnp.sum(scatter_to_bev_ring_diff(
            f, pid, batch.pillar_mask, CFG) * probe)

    def via_xla(f):
        return jnp.sum(scatter_to_bev(
            f, batch.coords, batch.pillar_mask, CFG) * probe)

    np.testing.assert_array_equal(np.asarray(via_ring(feats)),
                                  np.asarray(via_xla(feats)))
    g_ring = jax.grad(via_ring)(feats)
    g_xla = jax.grad(via_xla)(feats)
    np.testing.assert_array_equal(np.asarray(g_ring), np.asarray(g_xla))
    # padded/invalid pillar slots get zero cotangent
    assert not np.asarray(g_ring)[~np.asarray(batch.pillar_mask)].any()
