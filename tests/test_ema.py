"""Parameter EMA (train/ema.py): closed-form math, fit() integration,
and the .ema inference checkpoint round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.train.ema import EmaTracker, maybe_tracker


def _tree(rng):
    return {"a": jnp.asarray(rng.standard_normal((3, 4)), jnp.float32),
            "b": {"c": jnp.asarray(rng.standard_normal((5,)), jnp.float32)}}


@pytest.mark.parametrize("warmup", [False, True])
def test_ema_matches_closed_form(warmup):
    rng = np.random.default_rng(0)
    tree = _tree(rng)
    d = 0.9
    tr = EmaTracker(tree, decay=d, warmup=warmup)
    ref = jax.tree.map(np.asarray, tree)
    for step in range(4):
        # warmup schedule (TF-models/timm): min(d, (1+n)/(10+n)), n 1-based
        dn = min(d, (2.0 + step) / (11.0 + step)) if warmup else d
        new = jax.tree.map(
            lambda x: x + jnp.asarray(
                rng.standard_normal(x.shape), jnp.float32), tree)
        tr.update(new)
        ref = jax.tree.map(lambda e, p: e * dn + np.asarray(p) * (1 - dn),
                           ref, new)
    assert tr.count == 4
    for got, want in zip(jax.tree.leaves(tr.params), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_ema_warmup_tracks_early_iterates():
    # a short run with decay 0.999: without warmup the EMA barely moves
    # off the init; with warmup it lands near the recent iterates
    rng = np.random.default_rng(1)
    tree = {"w": jnp.zeros((4,), jnp.float32)}
    tr_warm = EmaTracker(tree, decay=0.999)            # default warmup=True
    tr_fixed = EmaTracker(tree, decay=0.999, warmup=False)
    target = {"w": jnp.ones((4,), jnp.float32)}
    for _ in range(50):
        tr_warm.update(target)
        tr_fixed.update(target)
    warm = float(np.asarray(tr_warm.params["w"])[0])
    fixed = float(np.asarray(tr_fixed.params["w"])[0])
    assert fixed < 0.06          # 1 - 0.999^50 ~ 0.049: still near init
    assert warm > 0.75           # warmup: near the iterates


def test_maybe_tracker_gate():
    assert maybe_tracker({"a": jnp.zeros(())}, 0.0) is None
    assert maybe_tracker({"a": jnp.zeros(())}, 0.99) is not None
    with pytest.raises(ValueError):
        EmaTracker({"a": jnp.zeros(())}, decay=1.5)


@pytest.mark.slow
def test_fit_with_ema_exports_loadable_weights(tmp_path):
    from tpu_pillars.detector import Detector
    from tpu_pillars.train.loop import fit, synthetic_batches
    from tpu_pillars.train.state import TrainConfig, create_train_state
    from tpu_pillars.train.step import make_train_step

    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=2, total_steps=10)
    state = create_train_state(cfg, tcfg)
    batches = synthetic_batches(cfg, tcfg, seed=0, num_objects=3,
                                points_per_object=60, clutter=200)
    ema = EmaTracker(state.params, decay=0.5)
    ckpt = str(tmp_path / "ck.msgpack")
    step_fn = jax.jit(make_train_step(cfg, fused_frontend=False,
                                      iou_chunk=4096))
    state = fit(state, batches, steps=3, step_fn=step_fn, config=cfg,
                ckpt_path=ckpt, ema=ema)
    assert ema.count == 3

    # EMA weights differ from the raw iterate but stay close (decay 0.5
    # over 3 steps from the same init)
    ra = jax.tree.leaves(state.params)[0]
    ea = jax.tree.leaves(ema.params)[0]
    assert not np.array_equal(np.asarray(ra), np.asarray(ea))

    # the .ema artifact loads as inference weights and runs
    det = Detector.from_checkpoint(cfg, ckpt + ".ema")
    for got, want in zip(jax.tree.leaves(det.variables["params"]),
                         jax.tree.leaves(ema.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    boxes = det.predict(np.zeros((10, cfg.num_input_features), np.float32))
    assert isinstance(boxes, list)

    # and refuses resume (no optimizer state)
    from tpu_pillars.train.checkpoint import restore_checkpoint

    with pytest.raises(ValueError):
        restore_checkpoint(ckpt + ".ema", state, config=cfg)
