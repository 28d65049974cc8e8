"""Decoration-free fused PFN (ops/fused_pfn.py) vs the reference
decorate + linear + masked-max composition, plus the emit kernel's new
meta sum rows. Tolerance-based parity: the fusion is the same algebra at
different rounding (module docstring), while the exact-contract pillarizer
tests (test_emit_pallas.py) continue to pin the un-fused path bit-for-bit."""

import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.ops.emit_pallas import (
    emit_pillar_table, sort_points_by_pillar,
)
from tpu_pillars.ops.fused_pfn import fold_decoration, pillarize_pfn_fused
from tpu_pillars.ops.voxelize import pillarize_batch

CFG = tiny_config()


def _cloud(rng, ns, cfg=CFG, f=4):
    pts = np.full((len(ns), cfg.max_points, f), 1e6, dtype=np.float32)
    for i, n in enumerate(ns):
        pts[i, :n, 0] = rng.uniform(cfg.x_min - 2, cfg.x_max + 2, n)
        pts[i, :n, 1] = rng.uniform(cfg.y_min - 2, cfg.y_max + 2, n)
        pts[i, :n, 2] = rng.uniform(cfg.z_min, cfg.z_max, n)
        pts[i, :n, 3] = rng.uniform(0, 1, n)
    return jnp.asarray(pts), jnp.asarray(ns, jnp.int32)


def _ref_pfn(batch, w, b):
    """decorate (already in batch.features) -> linear -> relu -> masked max."""
    y = jnp.einsum("bpnd,dc->bpnc", batch.features, w) + b
    y = jnp.maximum(y, 0.0)
    y = jnp.where(batch.mask[..., None], y, -1e9)
    pooled = jnp.max(y, axis=2)
    return jnp.where(batch.pillar_mask[..., None], pooled, 0.0)


def test_emit_meta_sum_rows(rng):
    pts, ns = _cloud(rng, [3000, 1500, 0])
    batch = pillarize_batch(pts, ns, CFG)
    gid_s, pts_s = sort_points_by_pillar(pts, ns, CFG)
    _, meta = emit_pillar_table(
        gid_s, pts_s, CFG.max_points_per_pillar, 4, CFG.max_pillars,
        CFG.grid_h * CFG.grid_w, interpret=True)
    P = CFG.max_pillars
    fmask = np.asarray(batch.mask)[..., None]
    want = (np.asarray(batch.features)[..., :3] * fmask).sum(axis=2)
    got = np.moveaxis(np.asarray(meta)[:, 2:5, :P], 1, 2)     # (B, P, 3)
    np.testing.assert_allclose(got, want, atol=1e-3)
    # count row == mask sums (exact)
    np.testing.assert_array_equal(
        np.asarray(meta)[:, 0, :P], np.asarray(batch.mask).sum(2))


def test_fused_pfn_matches_reference(rng):
    pts, ns = _cloud(rng, [3000, 4096, 1, 0])
    D = CFG.num_decorated_features
    C = CFG.pfn_channels
    w = jnp.asarray(rng.normal(size=(D, C)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    batch = pillarize_batch(pts, ns, CFG)
    want = _ref_pfn(batch, w, b)
    feats, pid, pmask = pillarize_pfn_fused(pts, ns, w, b, CFG,
                                            interpret=True)

    np.testing.assert_array_equal(np.asarray(pmask),
                                  np.asarray(batch.pillar_mask))
    want_pid = np.asarray(batch.coords[..., 0] * CFG.grid_w
                          + batch.coords[..., 1])
    got_pid = np.asarray(pid) * np.asarray(pmask)
    np.testing.assert_array_equal(got_pid, want_pid)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_fused_pfn_single_pillar_and_overflow(rng):
    # everything lands in one cell (point overflow beyond N), plus an
    # empty sample: fused output must still match the reference
    n = 500
    pts = np.full((2, CFG.max_points, 4), 1e6, np.float32)
    pts[0, :n, 0] = 3.2 + rng.uniform(0, 0.2, n)
    pts[0, :n, 1] = -1.4 + rng.uniform(0, 0.2, n)
    pts[0, :n, 2] = rng.uniform(-1, 1, n)
    pts[0, :n, 3] = rng.uniform(0, 1, n)
    ptsj = jnp.asarray(pts)
    ns = jnp.asarray([n, 0], jnp.int32)
    D, C = CFG.num_decorated_features, CFG.pfn_channels
    w = jnp.asarray(rng.normal(size=(D, C)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    batch = pillarize_batch(ptsj, ns, CFG)
    want = _ref_pfn(batch, w, b)
    feats, pid, pmask = pillarize_pfn_fused(ptsj, ns, w, b, CFG,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(want),
                               atol=2e-4, rtol=1e-4)
    assert np.asarray(pmask)[1].sum() == 0
    assert np.asarray(feats)[1].sum() == 0


def test_detector_fused_frontend_matches_classic(rng):
    # whole-detector parity: fused front end vs the classic
    # pillarize+decorate+PFN path on the same weights — boxes must agree
    # to tolerance (the fusion is re-rounded, not re-mathed)
    import jax

    from tpu_pillars.detector import Detector
    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.voxelize import PillarBatch

    cfg = CFG
    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    variables = model.init(jax.random.PRNGKey(7), dummy)
    det_classic = Detector(cfg, variables, fused_frontend=False)
    det_fused = Detector(cfg, variables, fused_frontend=True)

    from tpu_pillars.data.synthetic import make_scene
    scene = make_scene(rng, cfg, num_objects=5, clutter=800)
    got = det_fused.predict(scene.points)
    ref = det_classic.predict(scene.points)
    assert len(got) == len(ref) > 0
    for g, r in zip(got, ref):
        assert g.label == r.label
        np.testing.assert_allclose(g.score, r.score, atol=1e-4)
        np.testing.assert_allclose(g.center, r.center, atol=5e-3)
        np.testing.assert_allclose(g.wlh, r.wlh, atol=5e-3)
        assert abs((g.yaw - r.yaw + np.pi) % (2 * np.pi) - np.pi) < 5e-3


def test_fold_decoration_algebra(rng):
    # cell-centered form: W_eff^T r' + t == W^T d + b for a hand-built
    # pillar, with r' = [x - cx, y - cy, z, i] and t from the kernel's
    # formula (b_row - mx'*w0 - my'*w1 - mz*w2 - cx*w3 - cy*w4)
    D, C = CFG.num_decorated_features, 8
    F = CFG.num_raw_features
    w = rng.normal(size=(D, C)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    w_eff, w_dec = fold_decoration(jnp.asarray(w), jnp.asarray(b), CFG)
    raw = rng.normal(size=(5, F)).astype(np.float32) * 3
    mean = raw[:, :3].mean(0)
    cx, cy = 1.25, -3.75
    dec = np.concatenate([
        raw, raw[:, :3] - mean,
        np.stack([raw[:, 0] - cx, raw[:, 1] - cy], -1)], axis=1)
    want = dec @ w + b

    local = raw.copy()
    local[:, 0] -= cx
    local[:, 1] -= cy
    mx_l, my_l = mean[0] - cx, mean[1] - cy    # means of the locals
    wd = np.asarray(w_dec)
    t = (wd[5] - mx_l * wd[0] - my_l * wd[1] - mean[2] * wd[2]
         - cx * wd[3] - cy * wd[4])
    got = local @ np.asarray(w_eff) + t
    np.testing.assert_allclose(got, want, atol=1e-4)
