"""Full-config fused-front-end fidelity gate (round-3 VERDICT weak #3).

The TPU serving default (decoration-free fused front end, ops/fused_pfn.py)
is NOT bit-for-boxes: its single bf16 MXU pass re-rounds the PFN algebra.
Measured bound (trained full-config model, v5e, round 3): p99 center drift
0.061 m / yaw 0.0056 rad / score 0.009 vs the classic path (0.40 m before
cell-centering). These tests pin the drift as regression gates at the FULL
operating config (400x400, 12k pillars, 720k anchors), in three tiers:

* canvas gate — max relative drift of the BEV canvas (where the fused
  re-rounding actually happens);
* head-output gate — max relative drift after the convs, deterministic
  (no top-k/NMS selection discontinuity);
* box gate — selection-aware end-to-end sanity with gates at 2.5x the
  measured RANDOM-INIT actuals (on random weights, decode's exp()/diag
  amplifies rounded O(1) residuals to meters — that scale is a property
  of untrained heads, not of the fused path; the trained-model bound
  above stays the serving-quality number).

On CPU the kernels run in interpret mode at f32, so drift collapses to
rounding-order noise — the gates still exercise the full-config code path
and catch algebraic regressions (losing cell-centering was a 6x blowout).
On TPU all three passed 2026-08-20 with actuals printed to stderr
(scripts/probe_fused_fidelity_tpu.py runs them on the chip).

The bit-for-boxes contract (BASELINE.json north-star) is satisfied by the
classic path (`fused_frontend=False`), pinned elsewhere
(tests/test_detector_e2e.py vs the CPU oracle). See README "Fidelity
matrix" for which mode promises what.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.config import PillarsConfig
from tpu_pillars.data.synthetic import make_scene

pytestmark = pytest.mark.slow  # full-size compiles

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "pointpillars_synth4k.msgpack")


def _artifact_variables():
    from flax import serialization

    with open(ARTIFACT, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return {"params": raw["params"], "batch_stats": raw["batch_stats"]}


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


def test_fused_model_output_drift_full_config():
    """Deterministic end-to-end numeric gate: fused vs classic HEAD OUTPUTS
    at full config. Everything after the canvas is the same code on the
    same weights, so this measures exactly how the convs amplify the fused
    front end's re-rounding — with no selection discontinuity (top-k/NMS
    picking a neighboring anchor), which is what makes a box-level gate
    flaky on random-init weights. Measured v5e 2026-08-20 (random init,
    bit-repeatable across two fresh processes): cls 1.01e-2 /
    box 6.2e-3 / dir 7.0e-3 max rel — gate 5e-2 (~5x margin)."""
    import sys

    from tpu_pillars.detector import build_model_fn

    cfg = PillarsConfig()
    variables = _full_variables(cfg)
    rng = np.random.default_rng(1)
    scene = make_scene(rng, cfg, num_objects=40, points_per_object=300,
                       clutter=90000)
    from tpu_pillars.detector import Detector
    pts, n = Detector(cfg, variables).pad_points(scene.points)
    pts, n = jnp.asarray(pts), jnp.asarray(n)

    model_fn = jax.jit(build_model_fn(cfg, fused_frontend=False))
    model_fn_fused = jax.jit(build_model_fn(cfg, fused_frontend=True))
    ref = model_fn(variables, pts, n)
    got = model_fn_fused(variables, pts, n)
    rels = {}
    for name, a, b in zip(("cls", "box", "dir"), jax.tree.leaves(ref),
                          jax.tree.leaves(got)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max()
        rels[name] = float(np.abs(b - a).max() / scale)
    sys.stderr.write(f"[fused head-output max rel drift: {rels}]\n")
    for name, rel in rels.items():
        assert rel < 5e-2, f"{name} head-output rel drift {rel:.2e}"


def test_fused_box_drift_full_config():
    """Selection-aware gate: fused vs classic detections at full config.

    On RANDOM-INIT weights the dominant box-level effect is selection
    discontinuity — near-tied scores reorder and top-k/NMS picks a
    neighboring anchor — so the tails here are NOT a numeric-fidelity
    measure (the r3 bound on a TRAINED model is p99 0.061 m center /
    0.0056 rad yaw / 0.009 score, recorded in SURVEY.md:377 and the
    README fidelity matrix). Gates: set agreement (>= 75%% of boxes pair
    within 0.5 m), matched-pair p90s tight (numeric fidelity of the
    stable majority), p99 loose (selection tail). Measured actuals, v5e
    random init 2026-08-20: coverage 99.22%, center p50/p90/p99
    0.069/0.127/0.190 m, yaw p90/p99 0.019/0.034 rad, wlh p99 0.655 m,
    score p99 0.0002 — selection is STABLE (coverage + score say the same
    anchors win); the box-param drift is the head's bf16-rounded
    regression outputs amplified by decode's exp()/diagonal scaling,
    which on random-init O(1) residuals is meters-scale. Gates sit at
    ~2.5x those actuals: this test is the catastrophic-break sanity
    (coverage collapse, multi-meter drift — losing cell-centering blew
    far past these on trained weights); the NUMERIC fidelity gates are
    the canvas and head-output tests above, and the trained-model bound
    (p99 0.061 m center) is the r3 probe record in SURVEY.md:377. All
    percentiles print to stderr so on-chip runs record the actuals."""
    import sys

    from tpu_pillars.detector import Detector

    cfg = PillarsConfig()
    variables = _full_variables(cfg)
    rng = np.random.default_rng(1)
    scene = make_scene(rng, cfg, num_objects=40, points_per_object=300,
                       clutter=90000)

    stats = _box_drift_stats(cfg, variables, scene, label="random-init")

    assert stats["coverage"] >= 0.75, (
        f"only {stats['coverage']:.0%} of boxes pair within 0.5 m")
    assert stats["center_p90"] <= 0.32, f"center p90 {stats['center_p90']:.3f} m"
    assert stats["center_p99"] <= 0.48, f"center p99 {stats['center_p99']:.3f} m"
    assert stats["yaw_p90"] <= 0.05, f"yaw p90 {stats['yaw_p90']:.4f} rad"
    assert stats["wlh_p99"] <= 1.65, f"wlh p99 {stats['wlh_p99']:.3f} m"
    assert stats["score_p99"] <= 0.005, f"score p99 {stats['score_p99']:.4f}"


def _box_drift_stats(cfg, variables, scene, label=""):
    """Fused-vs-classic detection drift percentiles on one scene."""
    import sys

    from tpu_pillars.detector import Detector

    det_classic = Detector(cfg, variables, fused_frontend=False)
    det_fused = Detector(cfg, variables, fused_frontend=True)
    ref = det_classic.predict(scene.points)
    got = det_fused.predict(scene.points)
    assert len(ref) > 0 and len(got) > 0

    pairs = _greedy_center_match(ref, got, radius=0.5)
    coverage = 2 * len(pairs) / (len(ref) + len(got))

    d_center = np.array([np.linalg.norm(ref[i].center - got[j].center)
                         for i, j in pairs])
    d_yaw = np.array([abs((ref[i].yaw - got[j].yaw + np.pi) % (2 * np.pi)
                          - np.pi) for i, j in pairs])
    d_wlh = np.array([np.abs(ref[i].wlh - got[j].wlh).max()
                      for i, j in pairs])
    d_score = np.array([abs(ref[i].score - got[j].score)
                        for i, j in pairs])

    pct = lambda x, q: float(np.percentile(x, q))
    stats = {
        "coverage": coverage, "n_ref": len(ref), "n_got": len(got),
        "center_p50": pct(d_center, 50), "center_p90": pct(d_center, 90),
        "center_p99": pct(d_center, 99),
        "yaw_p90": pct(d_yaw, 90), "yaw_p99": pct(d_yaw, 99),
        "wlh_p99": pct(d_wlh, 99), "score_p99": pct(d_score, 99),
    }
    sys.stderr.write(
        f"[fused box drift ({label}): coverage {coverage:.2%} "
        f"({len(ref)} classic vs {len(got)} fused); "
        f"center p50/p90/p99 {stats['center_p50']:.4f}/"
        f"{stats['center_p90']:.4f}/{stats['center_p99']:.4f} m; "
        f"yaw p90/p99 {stats['yaw_p90']:.5f}/{stats['yaw_p99']:.5f} rad; "
        f"wlh p99 {stats['wlh_p99']:.4f} m; "
        f"score p99 {stats['score_p99']:.4f}]\n")
    return stats


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="trained artifact not present")
def test_fused_box_drift_trained_artifact():
    """THE serving-quality fidelity gate (r4 VERDICT weak #2 / next #3):
    fused-vs-classic box drift on the COMMITTED TRAINED weights
    (artifacts/pointpillars_synth4k.msgpack, 4000-step full-size synthetic
    run, round 5). On trained weights the head's regression outputs sit on
    O(0.01-0.1) residual scale, so decode's exp()/diag amplification is
    tame and the drift here IS the numeric-fidelity number users see.

    Measured actuals (v5e, round-5 artifact, 2026-08-20, on-chip via
    scripts/probe_fused_fidelity_tpu.py, the dense 102k-point scene):
    coverage 95.65% (57 classic vs 58 fused), center p50/p90/p99
    0.0471/0.0869/0.1170 m, yaw p90/p99 0.00580/0.00864 rad, wlh p99
    0.1334 m, score p99 0.0068 — the same order as the r3 trained-probe
    record (p99 0.061 m center, different checkpoint+scene), and ~1.6x
    TIGHTER than random-init at p99 (0.117 vs 0.190 m) with 5x tighter
    wlh (0.133 vs 0.655) and 4x tighter yaw, confirming the random-init
    tails are decode amplification, not fused-path error. Gates at
    ~2-2.5x the on-chip actuals; on CPU (interpret-mode f32 kernels)
    drift collapses far below them."""
    cfg = PillarsConfig()
    variables = _artifact_variables()
    rng = np.random.default_rng(1)
    scene = make_scene(rng, cfg, num_objects=40, points_per_object=300,
                       clutter=90000)

    stats = _box_drift_stats(cfg, variables, scene, label="trained")

    assert stats["coverage"] >= 0.85, (
        f"only {stats['coverage']:.0%} of boxes pair within 0.5 m")
    assert stats["center_p90"] <= 0.20, f"center p90 {stats['center_p90']:.4f} m"
    assert stats["center_p99"] <= 0.28, f"center p99 {stats['center_p99']:.4f} m"
    assert stats["yaw_p99"] <= 0.025, f"yaw p99 {stats['yaw_p99']:.4f} rad"
    assert stats["wlh_p99"] <= 0.33, f"wlh p99 {stats['wlh_p99']:.4f} m"
    assert stats["score_p99"] <= 0.017, f"score p99 {stats['score_p99']:.4f}"
