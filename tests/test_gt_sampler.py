"""GT-database sampling augmentation (data/gt_sampler.py): extraction,
collision-checked paste injection, background removal, persistence, and the
dataset_batches wiring."""

import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.data.gt_sampler import (
    GTDatabase, GTSampleConfig, GTSampler, points_in_box, points_in_boxes,
)
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.reference_cpu.postprocess import rotated_iou_bev_np

CFG = tiny_config()


def _db_from_scenes(rng, n=6):
    scenes = [make_scene(rng, CFG, num_objects=6, points_per_object=80,
                         clutter=500) for _ in range(n)]
    return GTDatabase.from_scenes(scenes, CFG.num_classes), scenes


def test_extraction_counts_and_local_frame(rng):
    db, scenes = _db_from_scenes(rng)
    assert db.counts().sum() > 0
    for ci in range(db.num_classes):
        for b, p in zip(db.boxes[ci], db.points[ci]):
            assert len(p) >= 5
            # stored points are box-local: inside the axis-aligned extent
            assert (np.abs(p[:, 0]) <= b[4] / 2 + 0.06).all()  # l on local x
            assert (np.abs(p[:, 1]) <= b[3] / 2 + 0.06).all()
            assert (np.abs(p[:, 2]) <= b[5] / 2 + 0.06).all()


def test_points_in_box_respects_yaw():
    box = np.array([10.0, 0.0, 0.0, 1.0, 4.0, 2.0, np.pi / 2])
    # box is long along world +y after the 90-degree yaw
    pts = np.array([[10.0, 1.8, 0.0],    # inside (along length)
                    [11.8, 0.0, 0.0],    # outside (width is only 1)
                    [10.4, 0.0, 0.0]])   # inside (within half-width)
    got = points_in_box(pts, box)
    assert got.tolist() == [True, False, True]


def test_injection_reaches_targets_without_collisions(rng):
    db, _ = _db_from_scenes(rng)
    scene = make_scene(rng, CFG, num_objects=2, points_per_object=80,
                       clutter=800)
    target = 3
    sampler = GTSampler(db, GTSampleConfig(target_per_class=target))
    pts, boxes, classes = sampler(rng, scene.points, scene.gt_boxes,
                                  scene.gt_classes)
    # originals preserved at the front
    np.testing.assert_array_equal(boxes[: len(scene.gt_boxes)],
                                  scene.gt_boxes)
    for ci in range(CFG.num_classes):
        have = int((classes == ci).sum())
        pool = len(db.boxes[ci]) + int((scene.gt_classes == ci).sum())
        assert have >= min(target, pool) or have >= int(
            (scene.gt_classes == ci).sum())
    # pairwise BEV IoU of the final set is zero off-diagonal
    iou = rotated_iou_bev_np(boxes, boxes)
    np.fill_diagonal(iou, 0.0)
    assert iou.max() == 0.0
    # every injected box contains points in the augmented cloud
    for b in boxes[len(scene.gt_boxes):]:
        assert points_in_box(pts, b, 0.06).sum() >= 5


def test_background_points_removed_under_injected_boxes(rng):
    db, _ = _db_from_scenes(rng)
    scene = make_scene(rng, CFG, num_objects=1, points_per_object=60,
                       clutter=2000)
    sampler = GTSampler(db, GTSampleConfig(target_per_class=2, margin=0.1))
    pts, boxes, classes = sampler(rng, scene.points, scene.gt_boxes,
                                  scene.gt_classes)
    n_inj = len(boxes) - len(scene.gt_boxes)
    assert n_inj > 0
    for b, ci in zip(boxes[len(scene.gt_boxes):],
                     classes[len(scene.gt_boxes):]):
        inside = pts[points_in_box(pts, b, 0.0)]
        # all surviving interior points came from the database entry, not
        # the original background: every one must be a stored object point
        orig_inside = scene.points[points_in_box(scene.points, b, 0.0)]
        # the injected object's own points
        assert len(inside) > 0
        # background that was inside the box got removed
        if len(orig_inside):
            # none of the original interior points survive (margin 0.1
            # covers the extraction margin 0.05)
            surv = {tuple(np.round(r, 4)) for r in inside[:, :3]}
            for r in orig_inside[:, :3]:
                assert tuple(np.round(r, 4)) not in surv


def test_injection_noop_when_scene_already_full(rng):
    db, _ = _db_from_scenes(rng)
    scene = make_scene(rng, CFG, num_objects=8, points_per_object=60,
                       clutter=500)
    sampler = GTSampler(db, GTSampleConfig(target_per_class=0))
    pts, boxes, classes = sampler(rng, scene.points, scene.gt_boxes,
                                  scene.gt_classes)
    np.testing.assert_array_equal(pts, scene.points)
    np.testing.assert_array_equal(boxes, scene.gt_boxes)


def test_inject_padded_respects_capacity(rng):
    db, _ = _db_from_scenes(rng)
    scene = make_scene(rng, CFG, num_objects=2, points_per_object=60,
                       clutter=500)
    cap = 4
    gb = np.zeros((cap, 7), np.float32)
    gc = np.zeros((cap,), np.int32)
    gv = np.zeros((cap,), bool)
    g = len(scene.gt_boxes)
    gb[:g], gc[:g], gv[:g] = scene.gt_boxes, scene.gt_classes, True
    sampler = GTSampler(db, GTSampleConfig(target_per_class=10))
    pts, ob, oc, ov = sampler.inject_padded(rng, scene.points, gb, gc, gv)
    assert ov.sum() <= cap
    assert ov.sum() > g            # something was injected
    assert ob.shape == gb.shape and oc.shape == gc.shape


def test_database_save_load_roundtrip(tmp_path, rng):
    db, _ = _db_from_scenes(rng)
    path = str(tmp_path / "gtdb.npz")
    db.save(path)
    db2 = GTDatabase.load(path)
    np.testing.assert_array_equal(db.counts(), db2.counts())
    for ci in range(db.num_classes):
        for b1, b2 in zip(db.boxes[ci], db2.boxes[ci]):
            np.testing.assert_array_equal(b1, b2)
        for p1, p2 in zip(db.points[ci], db2.points[ci]):
            np.testing.assert_array_equal(p1, p2)


def test_from_dataset_and_batches_wiring(tmp_path, rng):
    from tpu_pillars.data.fixture import build_fixture
    from tpu_pillars.data.lyft import LyftDataset
    from tpu_pillars.train.data import dataset_batches

    json_dir = build_fixture(str(tmp_path / "ds"), CFG, num_scenes=1,
                             samples_per_scene=2, sweeps_per_sample=1,
                             seed=3)
    ds = LyftDataset(json_dir)
    db = GTDatabase.from_dataset(ds, CFG)
    assert db.counts().sum() > 0
    sampler = GTSampler(db, GTSampleConfig(target_per_class=2))
    batch = next(iter(dataset_batches(ds, CFG, 2, 16, gt_sampler=sampler,
                                      seed=1, epochs=1)))
    # every sample in the batch reaches the target (capped by pool) for at
    # least the classes the database holds
    plain = next(iter(dataset_batches(ds, CFG, 2, 16, seed=1, epochs=1)))
    assert batch.gt_valid.sum() >= plain.gt_valid.sum()
    assert batch.points.shape == plain.points.shape


def test_points_in_boxes_bit_equals_per_box(rng):
    """The slab-prefiltered batched membership (the round-5 loader fast
    path) must be BIT-identical to per-box points_in_box at every margin —
    the augmentation stream's bit-determinism rests on it."""
    pts = rng.uniform(-50, 50, (5000, 4)).astype(np.float32)
    boxes = np.stack([
        np.array([*rng.uniform(-50, 50, 2), rng.uniform(-2, 1),
                  rng.uniform(0.5, 3), rng.uniform(0.5, 6),
                  rng.uniform(0.8, 3), rng.uniform(-np.pi, np.pi)],
                 np.float32)
        for _ in range(60)])
    for margin in (0.0, 0.05, 0.1):
        want = np.stack([points_in_box(pts, b, margin) for b in boxes])
        got = points_in_boxes(pts, boxes, margin)
        np.testing.assert_array_equal(got, want)
    # degenerate shapes
    assert points_in_boxes(pts, np.zeros((0, 7), np.float32)).shape == (0, 5000)
    assert points_in_boxes(pts[:0], boxes).shape == (60, 0)


def test_collision_prefilter_matches_exact_iou(rng):
    """The circumradius distance pre-filter (gt_sampler.collides /
    augment.noise_per_object) may only skip pairs whose exact BEV IoU is
    zero: verify on random box pairs that every pair skipped by the filter
    has IoU exactly 0."""
    boxes = np.stack([
        np.array([*rng.uniform(-20, 20, 2), 0.0,
                  rng.uniform(0.5, 3), rng.uniform(0.5, 6),
                  rng.uniform(0.8, 3), rng.uniform(-np.pi, np.pi)],
                 np.float32)
        for _ in range(80)])
    rad = 0.5 * np.hypot(boxes[:, 3], boxes[:, 4])
    iou = rotated_iou_bev_np(boxes, boxes)
    dx = boxes[:, None, 0] - boxes[None, :, 0]
    dy = boxes[:, None, 1] - boxes[None, :, 1]
    far = dx * dx + dy * dy >= (rad[:, None] + rad[None, :] + 1e-3) ** 2
    assert (iou[far] == 0.0).all()
    # and the filter is not vacuous: plenty of near pairs exist
    assert far.sum() > 0 and (~far).sum() > len(boxes)
