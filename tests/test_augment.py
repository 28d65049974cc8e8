"""Augmentation invariants: points that were inside a GT box stay inside the
transformed box, feature columns pass through, yaw stays wrapped."""

import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.data.augment import AugmentConfig, augment_scene
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.geometry.boxes import box_corners_bev

CFG = tiny_config()


def _points_in_box_mask(points, box):
    """BEV membership with a small tolerance + z extent check."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    cx, cy, cz, w, l, h, yaw = box
    dx, dy = x - cx, y - cy
    lx = dx * np.cos(-yaw) - dy * np.sin(-yaw)
    ly = dx * np.sin(-yaw) + dy * np.cos(-yaw)
    return (
        (np.abs(lx) <= l / 2 + 1e-4) & (np.abs(ly) <= w / 2 + 1e-4)
        & (np.abs(z - cz) <= h / 2 + 1e-4)
    )


def test_membership_preserved(rng):
    scene = make_scene(rng, CFG, num_objects=6, points_per_object=150,
                       clutter=500)
    before = [
        _points_in_box_mask(scene.points, b).sum() for b in scene.gt_boxes
    ]
    pts, boxes = augment_scene(rng, scene.points, scene.gt_boxes)
    after = [_points_in_box_mask(pts, b).sum() for b in boxes]
    # rigid+scale transforms preserve membership (up to f32 boundary noise)
    for nb, na in zip(before, after):
        assert abs(int(nb) - int(na)) <= 2


def test_feature_columns_untouched(rng):
    scene = make_scene(rng, CFG, num_objects=3, clutter=200)
    pts, _ = augment_scene(rng, scene.points, scene.gt_boxes)
    np.testing.assert_array_equal(pts[:, 3], scene.points[:, 3])


def test_yaw_wrapped_and_shapes(rng):
    scene = make_scene(rng, CFG, num_objects=5, clutter=100)
    cfg = AugmentConfig(rotation_range=np.pi)  # stress the wrap
    pts, boxes = augment_scene(rng, scene.points, scene.gt_boxes, cfg)
    assert pts.shape == scene.points.shape
    assert boxes.shape == scene.gt_boxes.shape
    assert np.all(boxes[:, 6] >= -np.pi) and np.all(boxes[:, 6] < np.pi)
    # inputs untouched (copies)
    assert not np.shares_memory(pts, scene.points)


def test_flip_only_mirrors(rng):
    scene = make_scene(rng, CFG, num_objects=4, clutter=100)
    cfg = AugmentConfig(flip_y_prob=1.0, rotation_range=0.0,
                        scale_range=(1.0, 1.0), translate_std=0.0)
    pts, boxes = augment_scene(rng, scene.points, scene.gt_boxes, cfg)
    np.testing.assert_allclose(pts[:, 1], -scene.points[:, 1])
    np.testing.assert_allclose(boxes[:, 1], -scene.gt_boxes[:, 1])
    # mirrored corners must equal corners of the mirrored box (set-wise)
    orig = box_corners_bev(scene.gt_boxes)      # (G, 4, 2)
    flipped = box_corners_bev(boxes)
    mirrored = orig * np.array([1.0, -1.0])
    for g in range(len(boxes)):
        got = set(map(tuple, np.round(flipped[g], 4)))
        want = set(map(tuple, np.round(mirrored[g], 4)))
        assert got == want


class TestNoisePerObject:
    def _scene(self, rng, n_boxes=4):
        from tpu_pillars.config import tiny_config
        from tpu_pillars.data.synthetic import make_scene

        cfg = tiny_config()
        s = make_scene(rng, cfg, num_objects=n_boxes, points_per_object=80,
                       clutter=300)
        return s.points, s.gt_boxes

    def test_points_move_with_boxes(self, rng):
        from tpu_pillars.data.augment import ObjectNoiseConfig, \
            noise_per_object
        from tpu_pillars.data.gt_sampler import points_in_box

        pts, boxes = self._scene(rng)
        before = [int(points_in_box(pts, b).sum()) for b in boxes]
        pts2, boxes2 = noise_per_object(
            rng, pts, boxes, ObjectNoiseConfig(translate_std=0.5))
        # membership is preserved: each moved box contains (at least) the
        # points that were inside it before — they rode along. Synthetic
        # points sit exactly ON the box surface, so the f32 rotation can
        # push them epsilon-outside: count with a small margin
        after = [int(points_in_box(pts2, b, margin=1e-3).sum())
                 for b in boxes2]
        for b4, a4 in zip(before, after):
            assert a4 >= b4
        # something actually moved
        assert not np.allclose(boxes2[:, :2], boxes[:, :2])
        # cloud size and feature columns untouched
        assert pts2.shape == pts.shape
        np.testing.assert_array_equal(pts2[:, 3], pts[:, 3])

    def test_no_collisions_after_noise(self, rng):
        from tpu_pillars.data.augment import ObjectNoiseConfig, \
            noise_per_object
        from tpu_pillars.reference_cpu.postprocess import rotated_iou_bev_np

        pts, boxes = self._scene(rng, n_boxes=6)
        _, boxes2 = noise_per_object(
            rng, pts, boxes, ObjectNoiseConfig(translate_std=1.0))
        iou = rotated_iou_bev_np(boxes2, boxes2)
        np.fill_diagonal(iou, 0.0)
        assert (iou == 0.0).all(), iou.max()

    def test_deterministic_under_seed(self, rng):
        from tpu_pillars.data.augment import noise_per_object

        pts, boxes = self._scene(rng)
        p1, b1 = noise_per_object(np.random.default_rng(5), pts, boxes)
        p2, b2 = noise_per_object(np.random.default_rng(5), pts, boxes)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(b1, b2)

    def test_prob_zero_is_identity(self, rng):
        from tpu_pillars.data.augment import ObjectNoiseConfig, \
            noise_per_object

        pts, boxes = self._scene(rng)
        p2, b2 = noise_per_object(rng, pts, boxes,
                                  ObjectNoiseConfig(prob=0.0))
        np.testing.assert_array_equal(p2, pts)
        np.testing.assert_array_equal(b2, boxes)
