"""Test-time augmentation (evaluation/tta.py): exactness of the flip
transforms, degradation to the plain detector, mirror symmetry of the
ensemble, and merge invariants."""

import numpy as np
import pytest

from tpu_pillars.config import tiny_config
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.detector import Detector
from tpu_pillars.evaluation.tta import (
    flip_points, predict_tta, unflip_boxes,
)
from tpu_pillars.reference_cpu.postprocess import rotated_iou_bev_np

CFG = tiny_config()


@pytest.fixture(scope="module")
def det():
    import jax
    import jax.numpy as jnp

    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.voxelize import PillarBatch

    model = PointPillars(CFG)
    dummy = PillarBatch(
        jnp.zeros((CFG.max_pillars, CFG.max_points_per_pillar,
                   CFG.num_decorated_features)),
        jnp.zeros((CFG.max_pillars, CFG.max_points_per_pillar), bool),
        jnp.zeros((CFG.max_pillars, 2), jnp.int32),
        jnp.zeros((CFG.max_pillars,), bool),
    )
    variables = model.init(jax.random.PRNGKey(0), dummy)
    return Detector(CFG, variables)


def test_flip_roundtrip_exact(rng):
    pts = rng.normal(0, 10, (50, 4)).astype(np.float32)
    boxes = rng.normal(0, 5, (20, 7)).astype(np.float32)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.5
    for mode in ("y", "x", "xy"):
        # points: flips are involutions (negation is exact in floats)
        np.testing.assert_array_equal(
            flip_points(flip_points(pts, mode), mode), pts)
        # boxes: footprint geometry is preserved through flip+unflip —
        # corners must coincide as SETS (yaw may wrap to an equivalent
        # angle of the same rectangle)
        back = unflip_boxes(unflip_boxes(boxes, mode), mode)
        np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-6)
        same = rotated_iou_bev_np(back, boxes)
        np.testing.assert_allclose(np.diagonal(same), 1.0, atol=1e-5)


def test_single_mode_equals_plain_predict(det, rng):
    scene = make_scene(rng, CFG, num_objects=4, clutter=400)
    base = det.predict(scene.points)
    tta = predict_tta(det, scene.points, modes=("none",))
    assert len(base) == len(tta)
    for a, b in zip(base, tta):
        np.testing.assert_array_equal(a.to_array(), b.to_array())
        assert a.label == b.label and a.score == b.score


def test_mirror_symmetry_of_closed_mode_set(det, rng):
    """{none, y} is closed under the y-flip, and flips are exact float
    negations — so TTA of the mirrored scene is the mirror of TTA of the
    scene, box for box."""
    scene = make_scene(rng, CFG, num_objects=4, clutter=400)
    a = predict_tta(det, scene.points, modes=("none", "y"))
    b = predict_tta(det, flip_points(scene.points, "y"),
                    modes=("none", "y"))
    assert len(a) == len(b)
    arr_a = np.stack([x.to_array() for x in a]) if a else np.zeros((0, 7))
    arr_b = np.stack([x.to_array() for x in b]) if b else np.zeros((0, 7))
    arr_b = unflip_boxes(arr_b, "y")
    # same score multiset; match boxes by sorting on (score, x, y)
    ka = np.lexsort((arr_a[:, 1], arr_a[:, 0],
                     -np.asarray([x.score for x in a])))
    kb = np.lexsort((arr_b[:, 1], arr_b[:, 0],
                     -np.asarray([x.score for x in b])))
    np.testing.assert_allclose(arr_a[ka][:, :6], arr_b[kb][:, :6],
                               atol=1e-5)
    same = rotated_iou_bev_np(arr_a[ka], arr_b[kb])
    np.testing.assert_allclose(np.diagonal(same), 1.0, atol=1e-4)


def test_evaluate_dataset_tta_identity_mode(det, tmp_path, rng):
    """evaluate_dataset(tta_modes=('none',)) reproduces the plain batched
    eval box-for-box on the on-disk fixture dataset."""
    from tpu_pillars.data.fixture import build_fixture
    from tpu_pillars.data.lyft import LyftDataset
    from tpu_pillars.evaluation.pipeline import evaluate_dataset

    json_dir = build_fixture(str(tmp_path / "lyft"), CFG, num_scenes=1,
                             samples_per_scene=3, seed=5)
    ds = LyftDataset(json_dir)
    mAP0, _, preds0 = evaluate_dataset(det, ds, batch_size=2)
    mAP1, _, preds1 = evaluate_dataset(det, ds, batch_size=2,
                                       tta_modes=("none",))
    assert mAP0 == mAP1
    assert preds0.keys() == preds1.keys()
    for tok in preds0:
        assert len(preds0[tok]) == len(preds1[tok])
        for a, b in zip(preds0[tok], preds1[tok]):
            np.testing.assert_allclose(a.to_array(), b.to_array(),
                                       rtol=0, atol=0)

    # the 2-view ensemble also runs end-to-end through the same surface
    mAP2, _, preds2 = evaluate_dataset(det, ds, batch_size=2,
                                       tta_modes=("none", "y"))
    assert np.isfinite(mAP2)
    assert preds2.keys() == preds0.keys()


def _row(x, y, yaw, score, cls=0, w=2.0, l=4.0):
    return np.asarray([x, y, 0.0, w, l, 1.6, yaw, score, cls, 1.0],
                      np.float32)


def test_wbf_merge_fuses_overlaps(rng):
    from tpu_pillars.evaluation.tta import merge_packed

    cfg = CFG
    # two near-identical detections of one object from 2 views + one far box
    union = np.stack([
        _row(0.0, 0.0, 0.1, 0.9),
        _row(0.4, 0.1, 0.15, 0.6),
        _row(30.0, 30.0, -0.5, 0.8, cls=2),
    ])
    out = merge_packed(union, cfg, method="wbf", num_views=2)
    assert len(out) == 2
    fused = out[np.argsort(out[:, 8])]          # cls 0 first
    w = np.asarray([0.9, 0.6]) / 1.5
    np.testing.assert_allclose(fused[0, 0], w @ [0.0, 0.4], atol=1e-6)
    np.testing.assert_allclose(fused[0, 1], w @ [0.0, 0.1], atol=1e-6)
    # both views saw it -> full score credit (mean)
    np.testing.assert_allclose(fused[0, 7], 0.75, atol=1e-6)
    # the lone cls-2 box: minority of views -> score halved
    np.testing.assert_allclose(fused[1, 7], 0.4, atol=1e-6)
    np.testing.assert_allclose(fused[1, :7], union[2, :7], atol=1e-6)


def test_wbf_yaw_circular_mean_and_flip(rng):
    from tpu_pillars.evaluation.tta import merge_packed

    cfg = CFG
    # yaws straddling the +-pi seam: mean must be ~pi, not ~0
    union = np.stack([
        _row(0.0, 0.0, np.pi - 0.05, 0.5),
        _row(0.0, 0.0, -np.pi + 0.05, 0.5),
    ])
    out = merge_packed(union, cfg, method="wbf", num_views=2)
    assert len(out) == 1
    assert abs(abs(out[0, 6]) - np.pi) < 0.06
    # pi-flipped duplicate (direction ambiguity): fused yaw stays aligned
    # with the seed's axis instead of averaging to a perpendicular angle
    union = np.stack([
        _row(0.0, 0.0, 0.1, 0.6),
        _row(0.0, 0.0, 0.1 + np.pi, 0.4),
    ])
    out = merge_packed(union, cfg, method="wbf", num_views=2)
    assert len(out) == 1
    np.testing.assert_allclose(out[0, 6], 0.1, atol=1e-5)


def test_wbf_different_classes_never_fuse():
    from tpu_pillars.evaluation.tta import merge_packed

    union = np.stack([
        _row(0.0, 0.0, 0.0, 0.9, cls=0),
        _row(0.0, 0.0, 0.0, 0.8, cls=1),
    ])
    out = merge_packed(union, CFG, method="wbf", num_views=1)
    assert len(out) == 2


def test_predict_tta_wbf_end_to_end(det, rng):
    scene = make_scene(rng, CFG, num_objects=4, clutter=400)
    boxes = predict_tta(det, scene.points, merge="wbf")
    assert len(boxes) > 0
    scores = [b.score for b in boxes]
    assert all(np.isfinite(s) and 0 < s <= 1 for s in scores)
    assert all(s1 >= s2 for s1, s2 in zip(scores, scores[1:]))


def test_merge_suppresses_same_class_duplicates(det, rng):
    """The full 4-view ensemble must not return two same-class boxes
    overlapping beyond the NMS threshold (the merge invariant)."""
    scene = make_scene(rng, CFG, num_objects=5, clutter=500)
    boxes = predict_tta(det, scene.points)
    assert len(boxes) > 0
    arr = np.stack([b.to_array() for b in boxes])
    labels = [b.label for b in boxes]
    iou = rotated_iou_bev_np(arr, arr)
    for i in range(len(arr)):
        for j in range(i + 1, len(arr)):
            if labels[i] == labels[j]:
                assert iou[i, j] <= CFG.nms_iou_threshold + 1e-5, (
                    i, j, iou[i, j])
    # scores descending, all finite, labels valid
    scores = [b.score for b in boxes]
    assert all(np.isfinite(s) for s in scores)
    assert all(s1 >= s2 for s1, s2 in zip(scores, scores[1:]))
    assert set(labels) <= set(CFG.class_names)
