"""Fused training front end (ops/fused_pfn.py pfn_train_from_table +
train/step.py fused_frontend): decorated-space Dense + masked BatchNorm
(batch stats) + ReLU + masked max, computed decoration-free from the flat
emit table with BN moments from sufficient statistics.

Same algebra as the classic path at different rounding — parity is pinned
to tolerance (see the bit-identity-across-XLA-programs note: fma fusion is
context-dependent), while the classic path keeps its exact-contract tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.ops.fused_pfn import (
    emit_centered_table,
    fold_decoration,
    pfn_from_table,
    pfn_from_table_xla,
    pfn_train_from_table,
)
from tpu_pillars.ops.pfn_pallas import fold_bn
from tpu_pillars.ops.voxelize import pillarize_batch, scatter_to_bev

CFG = tiny_config()
EPS = 1e-3  # MaskedBatchNorm default — pfn_train_from_table must match


def _cloud(rng, ns, cfg=CFG, f=4):
    pts = np.full((len(ns), cfg.max_points, f), 1e6, dtype=np.float32)
    for i, n in enumerate(ns):
        pts[i, :n, 0] = rng.uniform(cfg.x_min - 2, cfg.x_max + 2, n)
        pts[i, :n, 1] = rng.uniform(cfg.y_min - 2, cfg.y_max + 2, n)
        pts[i, :n, 2] = rng.uniform(cfg.z_min, cfg.z_max, n)
        pts[i, :n, 3] = rng.uniform(0, 1, n)
    return jnp.asarray(pts), jnp.asarray(ns, jnp.int32)


def _pfn_weights(rng, cfg=CFG):
    D, C = cfg.num_decorated_features, cfg.pfn_channels
    w = jnp.asarray(rng.normal(size=(D, C)).astype(np.float32)) * 0.3
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32)) * 0.1
    return w, scale, bias


def _classic_train_pfn(batch, w, scale, bias):
    """Reference: decorate (already in batch.features) -> linear -> masked
    batch-stat BN -> relu -> masked max (models/pfn.py algebra)."""
    y = jnp.einsum("bpnd,dc->bpnc", batch.features, w)
    fm = batch.mask[..., None].astype(jnp.float32)
    n = jnp.maximum(fm.sum(), 1.0)
    mean = (y * fm).sum(axis=(0, 1, 2)) / n
    var = (((y - mean) ** 2) * fm).sum(axis=(0, 1, 2)) / n
    yn = (y - mean) * jax.lax.rsqrt(var + EPS) * scale + bias
    yn = jnp.maximum(yn, 0.0)
    yn = jnp.where(batch.mask[..., None], yn, -1e9)
    pooled = jnp.max(yn, axis=2)
    feats = jnp.where(batch.pillar_mask[..., None], pooled, 0.0)
    return feats, mean, var


def test_xla_twin_matches_kernel(rng):
    pts, ns = _cloud(rng, [3000, 1500])
    w, scale, bias = _pfn_weights(rng)
    mean = jnp.asarray(rng.normal(size=(CFG.pfn_channels,)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, CFG.pfn_channels), jnp.float32)
    wf, bf = fold_bn(w, scale, bias, mean, var)
    w_eff, w_dec = fold_decoration(wf, bf, CFG)
    table, meta = emit_centered_table(pts, ns, CFG, interpret=True)
    f_k, pid_k, cnt_k = pfn_from_table(table, meta, w_eff, w_dec, CFG,
                                       interpret=True)
    f_x, pid_x, cnt_x = pfn_from_table_xla(table, meta, w_eff, w_dec, CFG)
    np.testing.assert_array_equal(np.asarray(pid_k), np.asarray(pid_x))
    np.testing.assert_array_equal(np.asarray(cnt_k), np.asarray(cnt_x))
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_x),
                               rtol=1e-5, atol=1e-5)


def test_train_stats_match_masked_bn(rng):
    pts, ns = _cloud(rng, [3000, 4096, 1, 0])
    w, scale, bias = _pfn_weights(rng)
    batch = pillarize_batch(pts, ns, CFG)
    _, mean_ref, var_ref = _classic_train_pfn(batch, w, scale, bias)
    table, meta = emit_centered_table(pts, ns, CFG, interpret=True)
    _, _, _, mean, var = pfn_train_from_table(table, meta, w, scale, bias,
                                              CFG)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-3, atol=1e-4)


def test_train_feats_match_classic_on_canvas(rng):
    pts, ns = _cloud(rng, [3000, 2000])
    w, scale, bias = _pfn_weights(rng)
    batch = pillarize_batch(pts, ns, CFG)
    feats_ref, _, _ = _classic_train_pfn(batch, w, scale, bias)
    canvas_ref = scatter_to_bev(feats_ref, batch.coords, batch.pillar_mask,
                                CFG)
    table, meta = emit_centered_table(pts, ns, CFG, interpret=True)
    feats, pid, cnt, _, _ = pfn_train_from_table(table, meta, w, scale,
                                                 bias, CFG)
    P = CFG.max_pillars
    feats, pid, cnt = feats[:, :P], pid[:, :P], cnt[:, :P]
    coords = jnp.stack([pid // CFG.grid_w, pid % CFG.grid_w], axis=-1)
    canvas = scatter_to_bev(feats, coords, cnt > 0.0, CFG)
    np.testing.assert_allclose(np.asarray(canvas), np.asarray(canvas_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_train_grads_match_classic(rng):
    pts, ns = _cloud(rng, [2500, 1200])
    w, scale, bias = _pfn_weights(rng)
    batch = pillarize_batch(pts, ns, CFG)
    table, meta = emit_centered_table(pts, ns, CFG, interpret=True)
    P = CFG.max_pillars

    def loss_classic(args):
        w_, s_, b_ = args
        feats, _, _ = _classic_train_pfn(batch, w_, s_, b_)
        canvas = scatter_to_bev(feats, batch.coords, batch.pillar_mask, CFG)
        return jnp.sum(jnp.sin(canvas))  # nonlinear probe

    def loss_fused(args):
        w_, s_, b_ = args
        feats, pid, cnt, _, _ = pfn_train_from_table(table, meta, w_, s_,
                                                     b_, CFG)
        feats, pid, cnt = feats[:, :P], pid[:, :P], cnt[:, :P]
        coords = jnp.stack([pid // CFG.grid_w, pid % CFG.grid_w], axis=-1)
        canvas = scatter_to_bev(feats, coords, cnt > 0.0, CFG)
        return jnp.sum(jnp.sin(canvas))

    v_c, g_c = jax.value_and_grad(loss_classic)((w, scale, bias))
    v_f, g_f = jax.value_and_grad(loss_fused)((w, scale, bias))
    np.testing.assert_allclose(float(v_f), float(v_c), rtol=1e-4)
    for a, b, name in zip(g_c, g_f, ("w", "scale", "bias")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch: {name}")


def _tiny_train_batch(rng, cfg, batch_size, max_gt=16):
    from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
    from tpu_pillars.train import TrainBatch

    scenes = [make_scene(rng, cfg, num_objects=6, points_per_object=60,
                         clutter=400) for _ in range(batch_size)]
    return TrainBatch(*scenes_to_train_batch(scenes, cfg, max_gt))


@pytest.mark.slow
def test_fused_train_step_matches_classic(rng):
    from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
    from tpu_pillars.train import (
        TrainBatch, TrainConfig, create_train_state, make_train_step,
    )

    cfg = CFG
    scenes = [make_scene(rng, cfg, num_objects=6, points_per_object=60,
                         clutter=400) for _ in range(2)]
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=16, total_steps=10)
    batch = TrainBatch(*scenes_to_train_batch(scenes, cfg, tcfg.max_gt_boxes))

    state_c = create_train_state(cfg, tcfg)
    state_f = create_train_state(cfg, tcfg)
    step_c = jax.jit(make_train_step(cfg, fused_frontend=False))
    step_f = jax.jit(make_train_step(cfg, fused_frontend=True))

    for i in range(3):
        state_c, losses_c = step_c(state_c, batch)
        state_f, losses_f = step_f(state_f, batch)
        np.testing.assert_allclose(float(losses_f.total),
                                   float(losses_c.total),
                                   rtol=2e-3, err_msg=f"step {i}")
        assert int(losses_f.num_pos) == int(losses_c.num_pos)

    # pfn running stats were updated by the fused path's own formula
    bn_c = jax.tree.map(np.asarray, state_c.batch_stats["pfn"]["bn"])
    bn_f = jax.tree.map(np.asarray, state_f.batch_stats["pfn"]["bn"])
    assert not np.allclose(bn_f["mean"], 0.0)
    np.testing.assert_allclose(bn_f["mean"], bn_c["mean"], rtol=1e-2,
                               atol=1e-4)
    np.testing.assert_allclose(bn_f["var"], bn_c["var"], rtol=1e-2,
                               atol=1e-4)
    # params stay in lockstep to tolerance
    flat_c = jax.tree.leaves(state_c.params)
    flat_f = jax.tree.leaves(state_f.params)
    for a, b in zip(flat_c, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)


@pytest.mark.slow
def test_fused_train_step_multisweep(rng):
    """Config-#4 shape: num_sweeps>1 adds the dt raw channel (F=5) — the
    fused front end's F/meta plumbing must track it."""
    from tpu_pillars.config import tiny_config
    from tpu_pillars.train import TrainConfig, create_train_state, \
        make_train_step

    cfg = tiny_config(num_sweeps=3, max_points=8192, max_pillars=768,
                      max_points_per_pillar=24)
    assert cfg.num_decorated_features == 10
    batch = _tiny_train_batch(rng, cfg, 2)
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=16, total_steps=10)

    state_c = create_train_state(cfg, tcfg)
    state_f = create_train_state(cfg, tcfg)
    step_c = jax.jit(make_train_step(cfg, fused_frontend=False))
    step_f = jax.jit(make_train_step(cfg, fused_frontend=True))
    for i in range(2):
        state_c, losses_c = step_c(state_c, batch)
        state_f, losses_f = step_f(state_f, batch)
        np.testing.assert_allclose(float(losses_f.total),
                                   float(losses_c.total),
                                   rtol=2e-3, err_msg=f"step {i}")
        assert int(losses_f.num_pos) == int(losses_c.num_pos)


@pytest.mark.slow
def test_fused_train_step_dp_mesh(rng):
    """fused_frontend=True under the GSPMD DP wrapper on the fake 8-device
    mesh: global-batch semantics must match the single-device fused step
    (same batch, replicated state) — pins that the fused front end's emit
    table + sufficient-statistics BN survive sharded lowering."""
    from tpu_pillars.parallel import make_mesh
    from tpu_pillars.parallel.train_dp import (
        make_dp_train_step, shard_train_batch,
    )
    from tpu_pillars.train import TrainConfig, create_train_state, \
        make_train_step

    cfg = CFG
    batch = _tiny_train_batch(rng, cfg, 8)
    tcfg = TrainConfig(batch_size=8, max_gt_boxes=16, total_steps=10)
    mesh = make_mesh()

    state_1 = create_train_state(cfg, tcfg)
    state_8 = create_train_state(cfg, tcfg)
    step_1 = jax.jit(make_train_step(cfg, fused_frontend=True))
    step_8 = make_dp_train_step(cfg, mesh, fused_frontend=True)
    sharded = shard_train_batch(batch, mesh)

    for i in range(2):
        state_1, losses_1 = step_1(state_1, batch)
        state_8, losses_8 = step_8(state_8, sharded)
        np.testing.assert_allclose(float(losses_8.total),
                                   float(losses_1.total),
                                   rtol=1e-4, err_msg=f"step {i}")
        assert int(losses_8.num_pos) == int(losses_1.num_pos)
    # sharded reductions reorder float sums, and early Adam steps amplify
    # tiny grad deltas through rsqrt of near-zero second moments (~3e-4
    # worst element observed). Real collective bugs diverge at O(1); bound
    # loosely here — the loss/num_pos lockstep above is the tight check.
    for a, b in zip(jax.tree.leaves(state_1.params),
                    jax.tree.leaves(state_8.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3)


@pytest.mark.parametrize("fused", [True, False])
@pytest.mark.slow
def test_shardmap_train_step_matches_single(rng, fused):
    """The explicit shard_map step (per-shard compute, psum'ed BN
    statistics, pmean'ed grads) computes the same global-batch update as
    the single-device step — losses, num_pos, params, AND the BN running
    stats (sync-BN: per-shard moments must reduce to the global-batch
    moments, not per-shard ones)."""
    from tpu_pillars.parallel import make_mesh, make_shardmap_train_step
    from tpu_pillars.parallel.train_dp import shard_train_batch
    from tpu_pillars.train import TrainConfig, create_train_state, \
        make_train_step

    cfg = CFG
    batch = _tiny_train_batch(rng, cfg, 8)
    tcfg = TrainConfig(batch_size=8, max_gt_boxes=16, total_steps=10)
    mesh = make_mesh()

    state_1 = create_train_state(cfg, tcfg)
    state_8 = create_train_state(cfg, tcfg)
    step_1 = jax.jit(make_train_step(cfg, fused_frontend=fused))
    step_8 = make_shardmap_train_step(cfg, mesh, fused_frontend=fused)
    sharded = shard_train_batch(batch, mesh)

    for i in range(2):
        state_1, losses_1 = step_1(state_1, batch)
        state_8, losses_8 = step_8(state_8, sharded)
        np.testing.assert_allclose(float(losses_8.total),
                                   float(losses_1.total),
                                   rtol=1e-4, err_msg=f"step {i}")
        assert int(losses_8.num_pos) == int(losses_1.num_pos)

    # sync-BN: running stats must equal the single-device global-batch ones
    bn_1 = jax.tree.map(np.asarray, state_1.batch_stats)
    bn_8 = jax.tree.map(np.asarray, state_8.batch_stats)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        b, a, rtol=1e-3, atol=1e-5), bn_1, bn_8)
    for a, b in zip(jax.tree.leaves(state_1.params),
                    jax.tree.leaves(state_8.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3)


@pytest.mark.slow
def test_fused_train_step_bf16(rng):
    """The TPU --bf16 default path is fused_frontend + compute_dtype=bf16:
    the fused PFN runs f32 (its matmul is one bf16 MXU pass anyway), the
    canvas is cast to bf16 for the convs, losses stay f32 — step losses
    must track the f32 fused step to bf16 tolerance."""
    from tpu_pillars.train import TrainConfig, create_train_state, \
        make_train_step

    cfg = CFG
    batch = _tiny_train_batch(rng, cfg, 2)
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=16, total_steps=10)

    state_32 = create_train_state(cfg, tcfg)
    state_16 = create_train_state(cfg, tcfg)
    step_32 = jax.jit(make_train_step(cfg, fused_frontend=True))
    step_16 = jax.jit(make_train_step(cfg, fused_frontend=True,
                                      compute_dtype=jnp.bfloat16))
    for i in range(3):
        state_32, l32 = step_32(state_32, batch)
        state_16, l16 = step_16(state_16, batch)
        assert np.isfinite(float(l16.total))
        np.testing.assert_allclose(float(l16.total), float(l32.total),
                                   rtol=2e-2, err_msg=f"step {i}")
    # master state stays f32
    for leaf in jax.tree.leaves(state_16.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state_16.batch_stats):
        assert leaf.dtype == jnp.float32


@pytest.mark.parametrize("variant", [
    dict(x_min=-32.0, x_max=32.0, y_min=-16.0, y_max=16.0,
         voxel_x=0.5, voxel_y=0.5),                      # rectangular grid
    dict(voxel_x=1.0, voxel_y=1.0, max_points_per_pillar=48),  # coarse
    dict(max_pillars=128, pre_nms_top_k=64, max_detections=32),  # tight
], ids=["rect_grid", "coarse_voxels", "small_budget"])
@pytest.mark.slow
def test_fused_step_matches_classic_on_variants(rng, variant):
    """The fused front end is the TPU train default — its parity with the
    classic path must hold across non-default grids and budgets, not just
    the square tiny config."""
    from tpu_pillars.train import TrainConfig, create_train_state, \
        make_train_step

    cfg = tiny_config(**variant)
    batch = _tiny_train_batch(rng, cfg, 2, max_gt=8)
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=8, total_steps=10)
    state_c = create_train_state(cfg, tcfg)
    state_f = create_train_state(cfg, tcfg)
    step_c = jax.jit(make_train_step(cfg, fused_frontend=False))
    step_f = jax.jit(make_train_step(cfg, fused_frontend=True))
    for i in range(2):
        state_c, l_c = step_c(state_c, batch)
        state_f, l_f = step_f(state_f, batch)
        np.testing.assert_allclose(float(l_f.total), float(l_c.total),
                                   rtol=2e-3, err_msg=f"step {i}")
        assert int(l_f.num_pos) == int(l_c.num_pos)
