"""Training-step tests: mechanics, checkpoint roundtrip, synthetic-scene
convergence, and data-parallel equivalence on the fake 8-device mesh
(SURVEY.md section 4 'Integration' + 'Distributed')."""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.parallel import (
    make_dp_train_step, make_mesh, shard_train_batch,
)
from tpu_pillars.train import (
    TrainBatch, TrainConfig, create_train_state, make_train_step,
    restore_checkpoint, save_checkpoint,
)

CFG = tiny_config()
TCFG = TrainConfig(total_steps=100, batch_size=2, max_gt_boxes=8,
                   learning_rate=1e-3)


def _make_batch(rng, cfg, tcfg, batch_size=None, **scene_kw):
    B = batch_size or tcfg.batch_size
    pts = np.full((B, cfg.max_points, cfg.num_raw_features), 1e6, np.float32)
    npts = np.zeros((B,), np.int32)
    gb = np.zeros((B, tcfg.max_gt_boxes, 7), np.float32)
    gc = np.zeros((B, tcfg.max_gt_boxes), np.int32)
    gv = np.zeros((B, tcfg.max_gt_boxes), bool)
    for i in range(B):
        scene = make_scene(rng, cfg, **scene_kw)
        n = min(len(scene.points), cfg.max_points)
        pts[i, :n] = scene.points[:n]
        npts[i] = n
        g = min(len(scene.gt_boxes), tcfg.max_gt_boxes)
        gb[i, :g] = scene.gt_boxes[:g]
        gc[i, :g] = scene.gt_classes[:g]
        gv[i, :g] = True
    return TrainBatch(jnp.asarray(pts), jnp.asarray(npts), jnp.asarray(gb),
                      jnp.asarray(gc), jnp.asarray(gv))


@pytest.mark.slow
def test_train_step_mechanics(rng):
    cfg, tcfg = CFG, TCFG
    state = create_train_state(cfg, tcfg)
    step = jax.jit(make_train_step(cfg, iou_chunk=4096))
    batch = _make_batch(rng, cfg, tcfg, num_objects=4, clutter=300)

    new_state, losses = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(losses.total))
    assert float(losses.num_pos) > 0
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0
    # BN running stats updated
    bdiff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.batch_stats, new_state.batch_stats)
    assert max(jax.tree.leaves(bdiff)) > 0


@pytest.mark.slow
def test_loss_decreases_overfitting_one_batch(rng):
    cfg, tcfg = CFG, TCFG
    state = create_train_state(cfg, tcfg)
    step = jax.jit(make_train_step(cfg, iou_chunk=4096))
    batch = _make_batch(rng, cfg, tcfg, num_objects=4, clutter=300,
                        class_subset=[0])

    first = None
    for _ in range(25):
        state, losses = step(state, batch)
        if first is None:
            first = float(losses.total)
    last = float(losses.total)
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, rng):
    cfg, tcfg = CFG, TCFG
    state = create_train_state(cfg, tcfg)
    step = jax.jit(make_train_step(cfg, iou_chunk=4096))
    batch = _make_batch(rng, cfg, tcfg, num_objects=3, clutter=200)
    state, _ = step(state, batch)

    path = os.path.join(tmp_path, "ckpt.msgpack")
    save_checkpoint(path, state)
    template = create_train_state(cfg, tcfg)
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resuming must produce the identical next state as continuing
    cont, _ = step(state, batch)
    resumed, _ = step(restored, batch)
    for a, b in zip(jax.tree.leaves(cont.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_dp_train_step_matches_single_device(rng):
    """GSPMD data-parallel step over the fake 8-device mesh == single-device
    jit on the same global batch (the whole point of global-batch DP)."""
    cfg, tcfg = CFG, TCFG
    mesh = make_mesh()
    assert mesh.devices.size == 8

    state = create_train_state(cfg, tcfg)
    batch = _make_batch(rng, cfg, tcfg, batch_size=8, num_objects=3,
                        clutter=200)

    single = jax.jit(make_train_step(cfg, iou_chunk=4096))
    s1, l1 = single(state, batch)

    dp = make_dp_train_step(cfg, mesh, iou_chunk=4096)
    sharded_batch = shard_train_batch(batch, mesh)
    s8, l8 = dp(state, sharded_batch)

    assert float(l8.num_pos) == float(l1.num_pos)
    np.testing.assert_allclose(float(l8.total), float(l1.total), rtol=1e-4)
    # collective (psum-tree) reduction order differs from the single-device
    # sum; Adam's rsqrt at step 1 amplifies that f32 noise to ~2e-5
    for a, b in zip(jax.tree.leaves(s8.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_optimizer_schedule_finite_for_short_runs():
    """Regression: optax.cosine_onecycle_schedule NaNs the learning rate
    when total_steps * warmup_frac < 1; our warmup+cosine build must stay
    finite for every run length."""
    from tpu_pillars.train.state import TrainConfig, make_optimizer
    import optax

    for total in (1, 2, 8, 100, 10000):
        tcfg = TrainConfig(total_steps=total, learning_rate=1e-3)
        tx = make_optimizer(tcfg)
        params = {"w": jnp.ones((3,))}
        opt_state = tx.init(params)
        grads = {"w": jnp.ones((3,))}
        for _ in range(min(total + 2, 12)):
            updates, opt_state = tx.update(grads, opt_state, params)
            for u in jax.tree.leaves(updates):
                assert np.isfinite(np.asarray(u)).all(), total


@pytest.mark.slow
def test_kill_and_resume_matches_straight_run(tmp_path):
    """--resume semantics: restore the checkpoint, fast-forward the seeded
    data stream by `step` batches — the continued loss curve is identical to
    a never-killed run (VERDICT round 1, item 9)."""
    import itertools

    from tpu_pillars.train.loop import synthetic_batches

    cfg = CFG
    tcfg = TrainConfig(total_steps=6, batch_size=2, max_gt_boxes=8,
                       learning_rate=1e-3)
    step = jax.jit(make_train_step(cfg, iou_chunk=4096))

    def run(state, batches, n):
        losses = []
        for _, batch in zip(range(n), batches):
            state, l = step(state, batch)
            losses.append(float(l.total))
        return state, losses

    # straight 6-step run
    sA, lossesA = run(create_train_state(cfg, tcfg),
                      synthetic_batches(cfg, tcfg, seed=0,
                                        num_objects=3, clutter=200), 6)

    # killed after 3 steps, checkpointed
    sB, lossesB = run(create_train_state(cfg, tcfg),
                      synthetic_batches(cfg, tcfg, seed=0,
                                        num_objects=3, clutter=200), 3)
    path = os.path.join(tmp_path, "ckpt.msgpack")
    save_checkpoint(path, sB)
    assert lossesB == lossesA[:3]

    # resumed: restore + skip the 3 consumed batches
    sC = restore_checkpoint(path, create_train_state(cfg, tcfg))
    assert int(sC.step) == 3
    resumed_stream = itertools.islice(
        synthetic_batches(cfg, tcfg, seed=0, num_objects=3, clutter=200),
        3, None)
    sC, lossesC = run(sC, resumed_stream, 3)

    assert lossesC == lossesA[3:], (lossesC, lossesA[3:])
    for a, b in zip(jax.tree.leaves(sC.params), jax.tree.leaves(sA.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_bf16_train_step_learns(rng):
    # mixed precision: bf16 activations, f32 params/opt/BN stats/losses —
    # step runs, losses are f32-finite and decrease on a fixed batch
    import jax
    import jax.numpy as jnp

    from tpu_pillars.config import tiny_config
    from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
    from tpu_pillars.train import (TrainBatch, TrainConfig, create_train_state,
                                   make_train_step)

    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=8, total_steps=60,
                       compute_dtype="bfloat16")
    state = create_train_state(cfg, tcfg)
    step = jax.jit(make_train_step(cfg, compute_dtype=jnp.bfloat16))
    scenes = [make_scene(rng, cfg, num_objects=4, points_per_object=120,
                         clutter=300) for _ in range(2)]
    batch = TrainBatch(*scenes_to_train_batch(scenes, cfg, tcfg.max_gt_boxes))
    state, first = step(state, batch)
    assert first.total.dtype == jnp.float32
    for _ in range(25):
        state, losses = step(state, batch)
    assert jnp.isfinite(losses.total)
    assert float(losses.total) < float(first.total)
    # master weights stayed f32
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(state.params))


def test_checkpoint_config_fingerprint(tmp_path, rng):
    # restoring against a different PillarsConfig fails fast and clearly;
    # fingerprint-less (older) checkpoints keep restoring fine
    import pytest

    from tpu_pillars.config import tiny_config
    from tpu_pillars.train import TrainConfig, create_train_state
    from tpu_pillars.train.checkpoint import restore_checkpoint, save_checkpoint

    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=4, total_steps=10)
    state = create_train_state(cfg, tcfg)
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, state, config=cfg)
    restore_checkpoint(path, state, config=cfg)       # same config: fine
    restore_checkpoint(path, state)                   # no check requested
    other = tiny_config(max_pillars=256)
    with pytest.raises(ValueError, match="different"):
        restore_checkpoint(path, state, config=other)
    # legacy checkpoint without fingerprint restores under any config
    save_checkpoint(path, state)
    restore_checkpoint(path, state, config=other)


@pytest.mark.slow
def test_remat_train_step_bit_equal(rng):
    # remat recomputes instead of saving — the step must produce BIT-EQUAL
    # losses and parameters (same ops, re-executed)
    import jax
    import jax.numpy as jnp

    from tpu_pillars.config import tiny_config
    from tpu_pillars.data.synthetic import make_scene, scenes_to_train_batch
    from tpu_pillars.train import (TrainBatch, TrainConfig, create_train_state,
                                   make_train_step)

    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=8, total_steps=10)
    scenes = [make_scene(rng, cfg, num_objects=4, points_per_object=120,
                         clutter=300) for _ in range(2)]
    batch = TrainBatch(*scenes_to_train_batch(scenes, cfg, tcfg.max_gt_boxes))

    outs = []
    for remat in (False, True, "pfn", "rpn"):
        state = create_train_state(cfg, tcfg, rng_key=jax.random.PRNGKey(3))
        step = jax.jit(make_train_step(cfg, remat=remat))
        for _ in range(2):
            state, losses = step(state, batch)
        outs.append((state, losses))
    (s0, l0) = outs[0]
    for s1, l1 in outs[1:]:
        assert float(l0.total) == float(l1.total)
        for a, b in zip(jax.tree.leaves(s0.params),
                        jax.tree.leaves(s1.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # param tree structure unchanged (checkpoint compatibility)
        assert (jax.tree_util.tree_structure(s0.params)
                == jax.tree_util.tree_structure(s1.params))


def test_detector_from_checkpoint_config_fingerprint(tmp_path, rng):
    # the inference-side restore applies the same fingerprint guard as
    # restore_checkpoint: wrong config -> clear error, right config -> loads
    import pytest

    from tpu_pillars.config import tiny_config
    from tpu_pillars.detector import Detector
    from tpu_pillars.train import TrainConfig, create_train_state
    from tpu_pillars.train.checkpoint import save_checkpoint

    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=4, total_steps=10)
    state = create_train_state(cfg, tcfg)
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, state, config=cfg)
    det = Detector.from_checkpoint(cfg, path)
    assert det.config is cfg
    other = tiny_config(max_pillars=256)
    with pytest.raises(ValueError, match="different"):
        Detector.from_checkpoint(other, path)


@pytest.mark.slow
def test_train_cli_dp(tmp_path):
    """--dp N: the CLI trains data-parallel via the shard_map step on a
    virtual 8-device CPU mesh — steps log finite losses and a checkpoint
    lands."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "dp_run")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, "-m", "tpu_pillars.train.loop", "--steps", "10",
         "--batch", "8", "--dp", "8", "--out", out, "--platform", "cpu",
         "--prefetch", "0", "--seed", "0"],
        env=env, cwd=repo, capture_output=True, timeout=900)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    with open(os.path.join(out, "train.jsonl")) as f:
        events = [json.loads(line) for line in f if line.strip()]
    steps = [e for e in events if e["event"] == "train_step"]
    assert steps and np.isfinite(steps[-1]["loss"])
    assert os.path.exists(os.path.join(out, "ckpt.msgpack"))


def test_export_inference_checkpoint(tmp_path, rng):
    """Serving artifact: params+stats only, ~3x smaller, loads through
    Detector.from_checkpoint with the fingerprint guard; restore_checkpoint
    refuses it (not a resume point)."""
    from tpu_pillars.detector import Detector
    from tpu_pillars.train.checkpoint import (
        export_inference_checkpoint, restore_checkpoint, save_checkpoint,
    )

    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=4, total_steps=10)
    state = create_train_state(cfg, tcfg)
    full = str(tmp_path / "full.msgpack")
    slim = str(tmp_path / "slim.msgpack")
    slim2 = str(tmp_path / "slim2.msgpack")
    save_checkpoint(full, state, config=cfg)
    export_inference_checkpoint(slim, state, config=cfg)
    export_inference_checkpoint(slim2, full)   # strip an on-disk ckpt

    assert os.path.getsize(slim) < os.path.getsize(full) / 2
    assert os.path.getsize(slim2) == os.path.getsize(slim)

    det_full = Detector.from_checkpoint(cfg, full)
    det_slim = Detector.from_checkpoint(cfg, slim)
    for a, b in zip(jax.tree.leaves(det_full.variables),
                    jax.tree.leaves(det_slim.variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # wrong config still fails fast on the slim artifact
    import pytest
    with pytest.raises(ValueError, match="different"):
        Detector.from_checkpoint(tiny_config(max_pillars=256), slim)
    # and it is NOT a resume point
    with pytest.raises(Exception):
        restore_checkpoint(slim, state, config=cfg)
