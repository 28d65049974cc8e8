"""Pillar-axis (spatial) sharding of the front end on the fake 8-device
CPU mesh (SURVEY.md section 5 'long-context analog' row: shard the pillar
axis over the mesh when one cloud's budget exceeds a single chip)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.data.synthetic import make_scene
from tpu_pillars.detector import Detector, build_canvas_fn
from tpu_pillars.models import PointPillars
from tpu_pillars.ops.voxelize import PillarBatch, pillarize
from tpu_pillars.parallel import (
    make_mesh, make_spatial_detector_fn, make_spatial_frontend,
    split_points_by_slab,
)

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
    return model.init(jax.random.PRNGKey(7), dummy)


def test_split_points_by_slab_membership_and_order(rng):
    cfg = CFG
    n = 8
    scene = make_scene(rng, cfg, num_objects=4, clutter=900)
    pts = scene.points
    shard_pts, counts, info = split_points_by_slab(pts, cfg, n)

    band = cfg.grid_h // n
    # every in-range point lands in the shard owning its row, in order
    row = np.floor((pts[:, 1] - cfg.y_min) / cfg.voxel_y).astype(np.int64)
    col = np.floor((pts[:, 0] - cfg.x_min) / cfg.voxel_x).astype(np.int64)
    in_range = ((col >= 0) & (col < cfg.grid_w) & (row >= 0)
                & (row < cfg.grid_h) & (pts[:, 2] >= cfg.z_min)
                & (pts[:, 2] <= cfg.z_max))
    assert info["dropped_range"] == int((~in_range).sum())
    assert info["dropped_capacity"] == 0
    assert counts.sum() == int(in_range.sum())
    for k in range(n):
        mine = pts[in_range & (row // band == k)]
        np.testing.assert_array_equal(shard_pts[k, :counts[k]], mine)
        assert not shard_pts[k, counts[k]:].any()  # zero padding

    # capacity overflow is counted, not silent
    _, counts_c, info_c = split_points_by_slab(pts, cfg, n, capacity=8)
    assert (counts_c <= 8).all()
    assert info_c["dropped_capacity"] == int(in_range.sum()) - counts_c.sum()


def _under_budget_scene(rng, cfg):
    """A scene whose occupied-pillar count stays under max_pillars: pillar
    overflow policy is per-device (ascending id within each band), so
    bit-identity with the single chip holds exactly when nothing
    overflows — the overflow case is covered (and asserted divergent by
    design) in test_spatial_budget_exceeds_one_chip."""
    scene = make_scene(rng, cfg, num_objects=5, clutter=200)
    batch = pillarize(jnp.asarray(scene.points), jnp.int32(len(scene.points)),
                      cfg)
    assert int(batch.pillar_mask.sum()) < cfg.max_pillars
    return scene


def test_spatial_frontend_canvas_bit_identical(rng):
    cfg = CFG
    mesh = make_mesh()
    variables = _init_variables(cfg)
    scene = _under_budget_scene(rng, cfg)

    det = Detector(cfg, variables)
    padded, count = det.pad_points(scene.points)
    single_canvas = jax.jit(build_canvas_fn(cfg))(
        variables, jnp.asarray(padded), jnp.int32(count))

    shard_pts, counts, _ = split_points_by_slab(scene.points, cfg,
                                                mesh.devices.size)
    frontend = make_spatial_frontend(cfg, mesh)
    sharded_canvas = frontend(variables, shard_pts, counts)

    assert sharded_canvas.shape == single_canvas.shape
    np.testing.assert_array_equal(np.asarray(sharded_canvas),
                                  np.asarray(single_canvas))


def test_spatial_detector_matches_single_device(rng):
    cfg = CFG
    mesh = make_mesh()
    variables = _init_variables(cfg)
    scene = _under_budget_scene(rng, cfg)

    det = Detector(cfg, variables)
    single_packed = np.asarray(det.predict_packed(scene.points))

    shard_pts, counts, _ = split_points_by_slab(scene.points, cfg,
                                                mesh.devices.size)
    predict = make_spatial_detector_fn(cfg, mesh)
    sharded_packed = np.asarray(predict(variables, shard_pts, counts))

    np.testing.assert_array_equal(sharded_packed, single_packed)


def test_spatial_budget_exceeds_one_chip(rng):
    """The point of the mechanism: a cloud whose occupied-pillar count
    overflows one chip's max_pillars budget is captured losslessly when
    every row band stays under the per-shard budget."""
    cfg = dataclasses.replace(CFG, max_pillars=48)
    n = 8
    mesh = make_mesh()
    variables = _init_variables(cfg)

    # ~2 points in every cell of a 16-row x 8-col block spanning all bands:
    # 128 occupied pillars > 48 = one chip's budget; 16 per band < 48
    H, W = cfg.grid_h, cfg.grid_w
    band = H // n
    rows = np.repeat(np.arange(0, H, H // 16), 8 * 2)
    cols = np.tile(np.repeat(np.arange(0, W, W // 8), 2), 16)
    x = cfg.x_min + (cols + 0.5) * cfg.voxel_x
    y = cfg.y_min + (rows + 0.5) * cfg.voxel_y
    z = np.zeros_like(x)
    i = rng.random(len(x)).astype(np.float32)
    pts = np.stack([x, y, z, i], 1).astype(np.float32)

    # single chip drops pillars (ascending-id overflow policy)...
    batch = pillarize(jnp.asarray(pts), jnp.int32(len(pts)), cfg)
    assert int(batch.pillar_mask.sum()) == cfg.max_pillars == 48

    # ...the sharded front end keeps all 128
    shard_pts, counts, _ = split_points_by_slab(pts, cfg, n)
    canvas = np.asarray(make_spatial_frontend(cfg, mesh)(
        variables, shard_pts, counts))
    assert (np.abs(canvas).max(axis=-1) > 0).sum() == 128
    # and each band's occupancy sits where the splitter put it
    occ_rows = np.unique(np.nonzero(np.abs(canvas).max(axis=-1))[0])
    assert {int(r // band) for r in occ_rows} == set(range(n))
