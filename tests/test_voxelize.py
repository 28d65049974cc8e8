"""JAX pillarizer vs the NumPy reference (SURVEY.md section 4: 'golden NumPy
reference vs on-device kernel, bit-for-boxes')."""

import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.ops.voxelize import pillarize, scatter_to_bev
from tpu_pillars.reference_cpu.pillarizer import pillarize_np

CFG = tiny_config()


def _pad(points, cfg):
    """Pad real points to the static budget with out-of-range sentinels."""
    m = cfg.max_points
    out = np.full((m, points.shape[1]), 1e6, dtype=np.float32)
    out[: len(points)] = points
    return out, np.int32(len(points))


def _run_both(points, cfg=CFG):
    ref = pillarize_np(points, cfg)
    padded, n = _pad(points, cfg)
    got = pillarize(jnp.asarray(padded), n, cfg)
    return ref, [np.asarray(g) for g in got]


def _random_cloud(rng, n, cfg=CFG, frac_outside=0.1):
    pts = np.zeros((n, 4), dtype=np.float32)
    span_x = cfg.x_max - cfg.x_min
    pts[:, 0] = rng.uniform(cfg.x_min - frac_outside * span_x,
                            cfg.x_max + frac_outside * span_x, n)
    pts[:, 1] = rng.uniform(cfg.y_min - 2, cfg.y_max + 2, n)
    pts[:, 2] = rng.uniform(cfg.z_min - 1, cfg.z_max + 1, n)
    pts[:, 3] = rng.uniform(0, 255, n)
    return pts.astype(np.float32)


def test_random_cloud_matches_reference(rng):
    pts = _random_cloud(rng, 3000)
    (rf, rm, rc, rp), (gf, gm, gc, gp) = _run_both(pts)
    np.testing.assert_array_equal(gm, rm)
    np.testing.assert_array_equal(gc, rc)
    np.testing.assert_array_equal(gp, rp)
    np.testing.assert_allclose(gf, rf, atol=1e-5)


def test_hand_case_cells_and_decoration():
    cfg = CFG
    # two points in one cell, one in another
    pts = np.array([
        [0.1, 0.1, 0.0, 7.0],
        [0.3, 0.2, 1.0, 9.0],
        [-5.2, 3.1, -1.0, 3.0],
    ], dtype=np.float32)
    (rf, rm, rc, rp), (gf, gm, gc, gp) = _run_both(pts)
    assert rp.sum() == 2 == gp.sum()
    # cells: (0.1,0.1) -> (row 40, col 40) id 3240; (-5.2,3.1) -> (46, 29) id 3709
    # pillars ordered by ascending id: the 2-point pillar comes first
    np.testing.assert_array_equal(rc[0], [40, 40])
    np.testing.assert_array_equal(rc[1], [46, 29])
    f = rf[0]
    np.testing.assert_allclose(f[0, :4], pts[0], atol=1e-6)
    # offset to mean: mean x = 0.2 -> x_c of first point = -0.1
    np.testing.assert_allclose(f[0, 4], -0.1, atol=1e-6)
    # offset to cell center: cell (40,40) center = (0.25, 0.25)
    np.testing.assert_allclose(f[0, 7], 0.1 - 0.25, atol=1e-6)
    np.testing.assert_allclose(f[0, 8], 0.1 - 0.25, atol=1e-6)
    np.testing.assert_allclose(gf, rf, atol=1e-6)
    np.testing.assert_array_equal(gc, rc)


def test_points_per_pillar_overflow_keeps_first_n():
    cfg = CFG
    n_over = cfg.max_points_per_pillar + 10
    pts = np.zeros((n_over, 4), dtype=np.float32)
    pts[:, 0] = 0.1
    pts[:, 1] = 0.1
    pts[:, 3] = np.arange(n_over)  # intensity = input order marker
    (rf, rm, rc, rp), (gf, gm, gc, gp) = _run_both(pts)
    assert rm[0].sum() == cfg.max_points_per_pillar
    # first N points in input order must be the ones kept
    np.testing.assert_array_equal(rf[0, :, 3], np.arange(cfg.max_points_per_pillar))
    np.testing.assert_allclose(gf, rf, atol=1e-5)
    np.testing.assert_array_equal(gm, rm)


def test_pillar_overflow_keeps_lowest_ids(rng):
    cfg = tiny_config(max_pillars=8)
    # 20 distinct cells along x
    pts = np.zeros((20, 4), dtype=np.float32)
    pts[:, 0] = cfg.x_min + 0.25 + 0.5 * np.arange(20)
    pts[:, 1] = 0.1
    ref, got = _run_both(pts, cfg)
    rf, rm, rc, rp = ref
    gf, gm, gc, gp = got
    assert rp.all() and gp.all()
    # kept pillars are the 8 lowest ids = smallest x cells
    np.testing.assert_array_equal(rc[:, 1], np.arange(8))
    np.testing.assert_array_equal(gc, rc)


def test_empty_cloud():
    pts = np.zeros((0, 4), dtype=np.float32)
    (rf, rm, rc, rp), (gf, gm, gc, gp) = _run_both(pts)
    assert not rp.any() and not gp.any()
    assert not rm.any() and not gm.any()
    np.testing.assert_allclose(gf, 0.0)


def test_out_of_range_points_dropped():
    cfg = CFG
    pts = np.array([
        [1e5, 0, 0, 1.0],            # way outside x
        [0, 0, cfg.z_max + 5, 1.0],  # above z range
        [0.1, 0.1, 0.0, 1.0],        # inside
    ], dtype=np.float32)
    (rf, rm, rc, rp), (gf, gm, gc, gp) = _run_both(pts)
    assert rp.sum() == 1 == gp.sum()
    assert rm.sum() == 1 == gm.sum()


def test_scatter_to_bev():
    cfg = tiny_config()
    P = cfg.max_pillars
    feats = np.zeros((P, 3), dtype=np.float32)
    coords = np.zeros((P, 2), dtype=np.int32)
    pmask = np.zeros((P,), dtype=bool)
    feats[0] = [1, 2, 3]
    coords[0] = [5, 7]
    pmask[0] = True
    feats[1] = [4, 5, 6]   # invalid pillar: must NOT land on canvas
    coords[1] = [9, 9]
    canvas = np.asarray(scatter_to_bev(jnp.asarray(feats), jnp.asarray(coords),
                                       jnp.asarray(pmask), cfg))
    np.testing.assert_allclose(canvas[5, 7], [1, 2, 3])
    np.testing.assert_allclose(canvas[9, 9], 0.0)
    assert np.abs(canvas).sum() == 6.0


def test_pillarize_batch_matches_single(rng):
    """Natively-batched pillarization == per-sample pillarize, field for
    field (same canonical semantics, one fused sort/scatter)."""
    import jax
    from tpu_pillars.ops.voxelize import pillarize_batch

    cfg = CFG
    B = 3
    clouds = [_random_cloud(rng, n) for n in (2500, 10, 3900)]
    padded, counts = zip(*[_pad(c, cfg) for c in clouds])
    batch = pillarize_batch(jnp.asarray(np.stack(padded)),
                            jnp.asarray(np.stack(counts)), cfg)
    for i, c in enumerate(clouds):
        single = pillarize(jnp.asarray(padded[i]), counts[i], cfg)
        np.testing.assert_array_equal(np.asarray(batch.mask[i]),
                                      np.asarray(single.mask))
        np.testing.assert_array_equal(np.asarray(batch.coords[i]),
                                      np.asarray(single.coords))
        np.testing.assert_array_equal(np.asarray(batch.pillar_mask[i]),
                                      np.asarray(single.pillar_mask))
        np.testing.assert_allclose(np.asarray(batch.features[i]),
                                   np.asarray(single.features), atol=1e-6)


def test_pillarize_batch_empty_sample(rng):
    from tpu_pillars.ops.voxelize import pillarize_batch

    cfg = CFG
    cloud = _random_cloud(rng, 1000)
    p1, n1 = _pad(cloud, cfg)
    p0, n0 = _pad(np.zeros((0, 4), np.float32), cfg)
    batch = pillarize_batch(jnp.asarray(np.stack([p0, p1])),
                            jnp.asarray(np.stack([n0, n1])), cfg)
    assert not np.asarray(batch.pillar_mask[0]).any()
    assert np.asarray(batch.pillar_mask[1]).any()
