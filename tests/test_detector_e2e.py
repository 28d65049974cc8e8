"""End-to-end fidelity: the single jitted TPU pipeline (points -> boxes) vs
the CPU reference pipeline on the same weights — the bit-for-boxes contract
(SURVEY.md section 4 'Integration'; BASELINE.json 'output fidelity
bit-for-boxes')."""

import jax
import pytest
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.detector import Detector
from tpu_pillars.models import PointPillars
from tpu_pillars.ops.voxelize import PillarBatch
from tpu_pillars.reference_cpu.convert import flax_to_torch
from tpu_pillars.reference_cpu.pipeline import CPUReferenceDetector
import jax.numpy as jnp

CFG = tiny_config()


def _init_variables(cfg):
    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    return model.init(jax.random.PRNGKey(42), dummy)


def test_jitted_pipeline_matches_cpu_reference(rng):
    cfg = CFG
    variables = _init_variables(cfg)
    tpu_det = Detector(cfg, variables)
    cpu_det = CPUReferenceDetector(cfg, flax_to_torch(variables, cfg))

    scene = make_scene(rng, cfg, num_objects=6, clutter=1000)

    got = tpu_det.predict(scene.points, token="t0")
    ref = cpu_det.predict(scene.points, token="t0")

    assert len(got) == len(ref) > 0
    for g, r in zip(got, ref):
        assert g.label == r.label
        assert g.token == "t0"
        np.testing.assert_allclose(g.score, r.score, atol=1e-4)
        np.testing.assert_allclose(g.center, r.center, atol=5e-3)
        np.testing.assert_allclose(g.wlh, r.wlh, atol=5e-3)
        assert abs((g.yaw - r.yaw + np.pi) % (2 * np.pi) - np.pi) < 5e-3


def test_host_crop_and_buckets_bit_equal(rng):
    # host-side range crop and bucketed upload shapes must not change a
    # single box bit: the crop mirrors the device validity predicate and
    # buckets only change padding rows
    cfg = CFG
    variables = _init_variables(cfg)
    det_plain = Detector(cfg, variables, host_crop=False)
    det_crop = Detector(cfg, variables)          # host_crop default on
    det_buck = Detector(cfg, variables,
                        wire_buckets=(1024, cfg.max_points))

    scene = make_scene(rng, cfg, num_objects=4, clutter=600)
    # salt with far out-of-range points that the crop removes
    far = rng.uniform(500, 900, (300, 4)).astype(np.float32)
    cloud = np.concatenate([scene.points, far], axis=0)

    want = np.asarray(det_plain.predict_packed(cloud))
    got_crop = np.asarray(det_crop.predict_packed(cloud))
    np.testing.assert_array_equal(got_crop, want)

    padded, n = det_buck.pad_points(scene.points[:700])
    assert padded.shape[0] == 1024          # smallest fitting bucket
    got_buck = np.asarray(det_buck.predict_packed(scene.points[:700]))
    want_small = np.asarray(det_plain.predict_packed(scene.points[:700]))
    np.testing.assert_array_equal(got_buck, want_small)

    with pytest.raises(ValueError, match="max_points"):
        Detector(cfg, variables, wire_buckets=(1024, 2048))


def test_batch_buckets_bit_equal(rng):
    # the batched serving path with bucketed upload shapes: stacking
    # same-bucket pads and running predict_packed_batch at the bucket's
    # (B, m, F) shape must reproduce the full-buffer batch bit for bit
    # (bench.py serves batches this way when buckets are enabled)
    cfg = CFG
    variables = _init_variables(cfg)
    det_plain = Detector(cfg, variables)
    det_buck = Detector(cfg, variables,
                        wire_buckets=(1024, cfg.max_points))

    scenes = [make_scene(rng, cfg, num_objects=3, clutter=500 + 40 * i)
              for i in range(3)]
    pads_b = [det_buck.pad_points(s.points) for s in scenes]
    assert all(p.shape[0] == 1024 for p, _ in pads_b)
    pads_f = [det_plain.pad_points(s.points) for s in scenes]
    assert all(p.shape[0] == cfg.max_points for p, _ in pads_f)

    got = np.asarray(det_buck.predict_packed_batch(
        np.stack([p for p, _ in pads_b]),
        np.asarray([n for _, n in pads_b])))
    want = np.asarray(det_plain.predict_packed_batch(
        np.stack([p for p, _ in pads_f]),
        np.asarray([n for _, n in pads_f])))
    np.testing.assert_array_equal(got, want)


def test_int16_wire_near_exact(rng):
    # int16 fixed-point wire: ~1 mm coordinate quantization at the tiny
    # config's 20 m range — detections must match the f32 wire to tight
    # tolerance (same boxes, same labels)
    cfg = CFG
    variables = _init_variables(cfg)
    det32 = Detector(cfg, variables)
    det16 = Detector(cfg, variables, wire_dtype=jnp.int16)
    scene = make_scene(rng, cfg, num_objects=5, clutter=900)
    ref = det32.predict(scene.points)
    got = det16.predict(scene.points)
    assert len(got) == len(ref) > 0
    for g, r in zip(got, ref):
        assert g.label == r.label
        np.testing.assert_allclose(g.score, r.score, atol=2e-3)
        np.testing.assert_allclose(g.center, r.center, atol=2e-2)
        np.testing.assert_allclose(g.wlh, r.wlh, atol=2e-2)
        assert abs((g.yaw - r.yaw + np.pi) % (2 * np.pi) - np.pi) < 2e-2
    # the wire really is 2 bytes/channel
    padded, _ = det16.pad_points(scene.points)
    assert padded.dtype == np.int16


def test_batched_predict_matches_single(rng):
    cfg = CFG
    variables = _init_variables(cfg)
    det = Detector(cfg, variables)

    scenes = [make_scene(rng, cfg, num_objects=4, clutter=500) for _ in range(3)]
    padded, counts = zip(*[det.pad_points(s.points) for s in scenes])
    batch_out = det.predict_raw_batch(np.stack(padded), np.asarray(counts))

    for i, s in enumerate(scenes):
        single = det.predict_raw(s.points)
        np.testing.assert_array_equal(np.asarray(batch_out.valid[i]),
                                      np.asarray(single.valid))
        np.testing.assert_allclose(np.asarray(batch_out.boxes[i]),
                                   np.asarray(single.boxes), atol=1e-5)


def test_predict_empty_cloud_runs_and_matches_reference():
    """Empty cloud must not crash. Note: with UNTRAINED weights the head
    biases give sigmoid(0)=0.5 >= thresholds, so even an empty canvas yields
    constant-score boxes — identical behavior to the CPU reference (a trained
    detector outputs strong negatives instead). Assert parity, not emptiness."""
    cfg = CFG
    variables = _init_variables(cfg)
    det = Detector(cfg, variables)
    cpu_det = CPUReferenceDetector(cfg, flax_to_torch(variables, cfg))
    pts = np.zeros((0, 4), np.float32)
    got = det.predict(pts)
    ref = cpu_det.predict(pts)
    assert isinstance(got, list)
    assert len(got) == len(ref)


def test_predict_applies_global_transform(rng):
    from tpu_pillars.geometry.quaternion import quat_from_yaw
    from tpu_pillars.geometry.transforms import Pose

    cfg = CFG
    variables = _init_variables(cfg)
    det = Detector(cfg, variables)
    scene = make_scene(rng, cfg, num_objects=5, clutter=500)

    local = det.predict(scene.points)
    pose = Pose(np.asarray(quat_from_yaw(0.5)), np.array([10.0, -5.0, 1.0]))
    glob = det.predict(scene.points, lidar_to_global=pose)
    assert len(local) == len(glob) > 0
    for lo, gl in zip(local, glob):
        expect = lo.transformed(pose.rotation, pose.translation)
        np.testing.assert_allclose(gl.center, expect.center, atol=1e-6)
        assert gl.yaw == expect.yaw


@pytest.mark.slow
def test_trained_weights_bit_for_boxes(rng):
    """The strongest fidelity statement: with TRAINED weights (separated
    scores, real detections) the jitted TPU pipeline and the CPU reference
    keep the same boxes in the same order with tightly matching params."""
    from tpu_pillars.data.synthetic import scenes_to_train_batch
    from tpu_pillars.train import TrainBatch, TrainConfig, create_train_state, make_train_step

    cfg = CFG
    tcfg = TrainConfig(learning_rate=2e-3, total_steps=120, batch_size=2,
                       max_gt_boxes=8)
    state = create_train_state(cfg, tcfg)
    step = jax.jit(make_train_step(cfg, iou_chunk=4096))
    scenes = [make_scene(rng, cfg, num_objects=4, points_per_object=200,
                         clutter=300, class_subset=[0, 7]) for _ in range(2)]
    batch = TrainBatch(*scenes_to_train_batch(scenes, cfg, tcfg.max_gt_boxes))
    for _ in range(120):
        state, _ = step(state, batch)

    # inference-mode variables after training
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    tpu_det = Detector(cfg, variables)
    cpu_det = CPUReferenceDetector(cfg, flax_to_torch(variables, cfg))

    checked = 0
    for scene in scenes:
        got = tpu_det.predict(scene.points)
        ref = cpu_det.predict(scene.points)
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            assert g.label == r.label
            np.testing.assert_allclose(g.score, r.score, atol=1e-3)
            np.testing.assert_allclose(g.center, r.center, atol=1e-2)
            np.testing.assert_allclose(g.wlh, r.wlh, atol=1e-2)
            assert abs((g.yaw - r.yaw + np.pi) % (2 * np.pi) - np.pi) < 1e-2
            checked += 1
    assert checked > 0  # the trained detector actually detects


def test_wire_head_matches_ssd_head(rng):
    """The serving head (explicit matmuls emitting the wire layout —
    detector._wire_head) must compute the same logits as SSDHead's 1x1
    convs: `own` = own-class logits in canonical anchor order, box/dir
    feature-major in the permuted order a'' = a_loc * HW + hw."""
    from tpu_pillars.detector import _wire_head
    from tpu_pillars.ops.anchors import make_anchors

    cfg = CFG
    variables = _init_variables(cfg)
    model = PointPillars(cfg)
    canvas = jnp.asarray(
        rng.normal(0, 1, (cfg.grid_h, cfg.grid_w, cfg.pfn_channels))
        .astype(np.float32))
    out = model.apply(variables, canvas,
                      method=PointPillars.detect_from_canvas)
    feat = model.apply(variables, canvas,
                       method=PointPillars.features_from_canvas)
    own, box_p, dir_p = _wire_head(cfg)(variables["params"]["head"], feat)

    A, A_loc = cfg.num_anchors, cfg.anchors_per_loc
    hw = A // A_loc
    _, anchor_cls = make_anchors(cfg)
    cls = np.asarray(out.cls_logits)
    np.testing.assert_allclose(np.asarray(own),
                               cls[np.arange(A), anchor_cls],
                               rtol=1e-5, atol=1e-4)
    for got, want_am, k in ((box_p, out.box_deltas, 7),
                            (dir_p, out.dir_logits, 2)):
        want = (np.asarray(want_am).reshape(hw, A_loc, k)
                .transpose(2, 1, 0).reshape(k, A))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-4)


def test_predict_deterministic(rng):
    cfg = CFG
    variables = _init_variables(cfg)
    det = Detector(cfg, variables)
    scene = make_scene(rng, cfg, num_objects=4, clutter=500)
    a = det.predict_raw(scene.points)
    b = det.predict_raw(scene.points)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_from_checkpoint_and_stream(rng, tmp_path):
    """Detector.from_checkpoint restores trained variables without running
    the model; predict_stream pipelines multiple sweeps."""
    from tpu_pillars.train import TrainConfig, create_train_state, save_checkpoint

    cfg = CFG
    tcfg = TrainConfig(batch_size=2, max_gt_boxes=8, total_steps=10)
    state = create_train_state(cfg, tcfg)
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state)

    det = Detector.from_checkpoint(cfg, path)
    for a, b in zip(jax.tree.leaves(det.variables["params"]),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    scenes = [make_scene(rng, cfg, num_objects=3, clutter=300)
              for _ in range(4)]
    streamed = list(det.predict_stream(s.points for s in scenes))
    assert len(streamed) == 4
    for s, boxes in zip(scenes, streamed):
        direct = det.predict(s.points)
        assert len(direct) == len(boxes)
        for a, b in zip(boxes, direct):
            np.testing.assert_array_equal(a.to_array(), b.to_array())
    # the threaded producer (default) must yield the same ordered results
    # as the single-thread deque pipeline
    serial = list(det.predict_stream((s.points for s in scenes),
                                     threaded=False))
    assert len(serial) == len(streamed)
    for xs, ys in zip(streamed, serial):
        assert len(xs) == len(ys)
        for a, b in zip(xs, ys):
            np.testing.assert_array_equal(a.to_array(), b.to_array())
