import numpy as np

from tpu_pillars.config import PillarsConfig, tiny_config
from tpu_pillars.ops.anchors import make_anchors
from tpu_pillars.ops.box_coder import decode_boxes, encode_boxes


def _random_boxes(rng, n):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-50, 50, (n, 2))
    boxes[:, 2] = rng.uniform(-2, 2, n)
    boxes[:, 3:6] = rng.uniform(0.5, 8.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_encode_decode_roundtrip(rng):
    boxes = _random_boxes(rng, 64)
    anchors = _random_boxes(rng, 64)
    deltas = encode_boxes(boxes, anchors)
    back = np.asarray(decode_boxes(deltas, anchors))
    np.testing.assert_allclose(back, boxes, rtol=1e-4, atol=1e-4)


def test_encode_identity_is_zero(rng):
    anchors = _random_boxes(rng, 16)
    deltas = np.asarray(encode_boxes(anchors, anchors))
    np.testing.assert_allclose(deltas, 0.0, atol=1e-6)


def test_anchor_grid_shape_and_layout():
    cfg = PillarsConfig()
    anchors, cls_ids = make_anchors(cfg)
    assert anchors.shape == (cfg.num_anchors, 7)
    assert cfg.num_anchors == 200 * 200 * 18
    # layout: (row, col, class*yaw) flattened; first two anchors are class 0
    # at yaw 0 then yaw pi/2, same location
    assert cls_ids[0] == 0 and cls_ids[1] == 0 and cls_ids[2] == 1
    np.testing.assert_allclose(anchors[0, :3], anchors[1, :3])
    assert anchors[0, 6] == 0.0
    assert anchors[1, 6] == np.float32(np.pi / 2)
    # first location center: x_min + half stride
    assert anchors[0, 0] == np.float32(cfg.x_min + 0.5 * cfg.voxel_x * cfg.head_stride)
    assert anchors[0, 1] == np.float32(cfg.y_min + 0.5 * cfg.voxel_y * cfg.head_stride)
    # second location steps in x (col-major within a row)
    a_loc = cfg.anchors_per_loc
    assert anchors[a_loc, 0] - anchors[0, 0] == np.float32(cfg.voxel_x * cfg.head_stride)
    assert anchors[a_loc, 1] == anchors[0, 1]
    # anchor dims match class specs
    spec = cfg.classes[0]
    np.testing.assert_allclose(anchors[0, 3:6], [spec.width, spec.length, spec.height])
    assert anchors[0, 2] == np.float32(spec.z_center)


def test_anchor_grid_covers_range():
    cfg = tiny_config()
    anchors, _ = make_anchors(cfg)
    assert anchors[:, 0].min() >= cfg.x_min
    assert anchors[:, 0].max() <= cfg.x_max
    assert anchors[:, 1].min() >= cfg.y_min
    assert anchors[:, 1].max() <= cfg.y_max


def test_config_derived_shapes():
    cfg = PillarsConfig()
    cfg.validate()
    assert cfg.grid_w == 400 and cfg.grid_h == 400
    assert cfg.feature_w == 200 and cfg.feature_h == 200
    assert cfg.num_classes == 9
    assert cfg.anchors_per_loc == 18
    assert cfg.num_decorated_features == 9  # x,y,z,i + xc,yc,zc + xp,yp
    multi = cfg.replace(num_sweeps=5)
    assert multi.num_decorated_features == 10  # + dt
