"""Gradient accumulation (make_train_step accum_steps): the scan-of-
microbatches formulation must reproduce the single-pass update when the
microbatches carry identical data (then per-microbatch BN moments equal the
full-batch moments, so the averaged gradients ARE the full-batch gradients
up to float reassociation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.train import (
    TrainBatch, TrainConfig, create_train_state, make_train_step,
)

CFG = tiny_config()
TCFG = TrainConfig(total_steps=100, batch_size=2, max_gt_boxes=8,
                   learning_rate=1e-3)


def _duplicated_batch(rng, cfg, tcfg, copies=2, **scene_kw):
    """One synthetic sample replicated `copies` times along the batch."""
    scene = make_scene(rng, cfg, **scene_kw)
    pts = np.full((1, cfg.max_points, cfg.num_raw_features), 1e6, np.float32)
    n = min(len(scene.points), cfg.max_points)
    pts[0, :n] = scene.points[:n]
    gb = np.zeros((1, tcfg.max_gt_boxes, 7), np.float32)
    gc = np.zeros((1, tcfg.max_gt_boxes), np.int32)
    gv = np.zeros((1, tcfg.max_gt_boxes), bool)
    g = min(len(scene.gt_boxes), tcfg.max_gt_boxes)
    gb[0, :g] = scene.gt_boxes[:g]
    gc[0, :g] = scene.gt_classes[:g]
    gv[0, :g] = True
    rep = lambda x: jnp.asarray(np.repeat(x, copies, axis=0))
    return TrainBatch(rep(pts), rep(np.full((1,), n, np.int32)), rep(gb),
                      rep(gc), rep(gv))


@pytest.mark.parametrize("fused", [False, True])
@pytest.mark.slow
def test_accum_matches_single_pass_on_duplicated_batch(rng, fused):
    import optax

    cfg, tcfg = CFG, TCFG
    state = create_train_state(cfg, tcfg)
    # swap AdamW for plain SGD: the equivalence under test is about the
    # GRADIENTS (averaged-micro == full-batch), and Adam's first-step
    # g/sqrt(v) normalization amplifies ulp-level reassociation noise into
    # +-lr sign flips wherever the true gradient is ~0 — SGD updates scale
    # linearly with the gradient diff, so a tight tolerance is meaningful
    sgd = optax.sgd(1e-3)
    state = state.replace(tx=sgd, opt_state=sgd.init(state.params))
    batch = _duplicated_batch(rng, cfg, tcfg, copies=2,
                              num_objects=4, clutter=300)
    kw = dict(iou_chunk=4096, fused_frontend=fused)
    s1, l1 = jax.jit(make_train_step(cfg, **kw))(state, batch)
    s2, l2 = jax.jit(make_train_step(cfg, accum_steps=2, **kw))(state, batch)

    np.testing.assert_allclose(float(l2.total), float(l1.total),
                               rtol=1e-5, atol=1e-6)
    assert float(l2.num_pos) == float(l1.num_pos)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-6)
    assert int(s2.step) == 1                     # ONE optimizer update


@pytest.mark.slow
def test_accum_multi_step_loss_decreases(rng):
    cfg, tcfg = CFG, TCFG
    state = create_train_state(cfg, tcfg)
    step = jax.jit(make_train_step(cfg, iou_chunk=4096, accum_steps=2))
    batch = _duplicated_batch(rng, cfg, tcfg, copies=4,
                              num_objects=3, clutter=200)
    first = None
    for _ in range(6):
        state, losses = step(state, batch)
        first = first if first is not None else float(losses.total)
    assert float(losses.total) < first
    assert int(state.step) == 6


@pytest.mark.slow
def test_accum_composes_with_shardmap_dp(rng):
    """accum_steps under the shard_map DP step: sync-BN psums run inside
    the microbatch scan per shard — the composition must compile and the
    replicated update must stay finite and in sync across shards."""
    import jax

    from tpu_pillars.parallel import (
        make_mesh, make_shardmap_train_step, shard_train_batch,
    )

    devices = jax.devices("cpu")[:4]
    if len(devices) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(devices)
    cfg, tcfg = CFG, TCFG
    state = create_train_state(cfg, tcfg)
    step = make_shardmap_train_step(cfg, mesh, iou_chunk=2048,
                                    accum_steps=2)
    # per-shard batch of 2 -> each shard scans 2 microbatches of 1
    batch = _duplicated_batch(rng, cfg, tcfg, copies=8,
                              num_objects=3, clutter=200)
    batch = shard_train_batch(batch, mesh)
    new_state, losses = step(state, batch)
    jax.block_until_ready(new_state.params)
    assert int(new_state.step) == 1
    assert np.isfinite(float(losses.total))


def test_accum_requires_divisible_batch(rng):
    cfg, tcfg = CFG, TCFG
    state = create_train_state(cfg, tcfg)
    step = make_train_step(cfg, iou_chunk=4096, accum_steps=2)
    batch = _duplicated_batch(rng, cfg, tcfg, copies=3,
                              num_objects=2, clutter=100)
    with pytest.raises(AssertionError):
        jax.jit(step)(state, batch)
