"""Rotated IoU vs an independent NumPy Sutherland–Hodgman oracle
(SURVEY.md section 4: 'rotated IoU vs brute-force polygon clipping')."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pillars.geometry.boxes import box_corners_bev
from tpu_pillars.ops.iou import iou_3d, rotated_iou_bev, rotated_iou_bev_chunked


# ---------- oracle: sequential Sutherland–Hodgman clipping, float64 ----------

def _clip_polygon(subject, clip_poly):
    """Clip `subject` (list of 2-vectors) by convex CCW `clip_poly`."""
    out = list(subject)
    n = len(clip_poly)
    for i in range(n):
        a, b = clip_poly[i], clip_poly[(i + 1) % n]
        inp, out = out, []
        if not inp:
            break
        edge = b - a

        def inside(p):
            return edge[0] * (p[1] - a[1]) - edge[1] * (p[0] - a[0]) >= -1e-12

        for j in range(len(inp)):
            cur, nxt = inp[j], inp[(j + 1) % len(inp)]
            if inside(cur):
                out.append(cur)
                if not inside(nxt):
                    out.append(_line_intersect(cur, nxt, a, b))
            elif inside(nxt):
                out.append(_line_intersect(cur, nxt, a, b))
    return out


def _line_intersect(p1, p2, a, b):
    r, s = p2 - p1, b - a
    denom = r[0] * s[1] - r[1] * s[0]
    t = ((a[0] - p1[0]) * s[1] - (a[1] - p1[1]) * s[0]) / denom
    return p1 + t * r


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    pts = np.array(poly)
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def oracle_iou_bev(boxes1, boxes2):
    c1 = box_corners_bev(boxes1)
    c2 = box_corners_bev(boxes2)
    out = np.zeros((len(boxes1), len(boxes2)))
    for i in range(len(boxes1)):
        for j in range(len(boxes2)):
            inter = _poly_area(_clip_polygon(list(c1[i]), list(c2[j])))
            a1 = boxes1[i, 3] * boxes1[i, 4]
            a2 = boxes2[j, 3] * boxes2[j, 4]
            out[i, j] = inter / max(a1 + a2 - inter, 1e-12)
    return out


def _random_boxes(rng, n, span=20.0):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-span, span, (n, 2))
    boxes[:, 2] = rng.uniform(-2, 2, n)
    boxes[:, 3] = rng.uniform(0.5, 4.0, n)   # w
    boxes[:, 4] = rng.uniform(0.5, 10.0, n)  # l
    boxes[:, 5] = rng.uniform(0.5, 4.0, n)   # h
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_identical_boxes_iou_one(rng):
    b = _random_boxes(rng, 8)
    iou = np.asarray(rotated_iou_bev(b, b))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)


def test_disjoint_boxes_iou_zero():
    b1 = np.array([[0, 0, 0, 2, 4, 1, 0.3]], dtype=np.float32)
    b2 = np.array([[100, 100, 0, 2, 4, 1, -0.8]], dtype=np.float32)
    assert float(rotated_iou_bev(b1, b2)[0, 0]) == pytest.approx(0.0, abs=1e-6)


def test_axis_aligned_known_value():
    # two unit-ish rects offset by half: inter = 1x2=2, union = 4+4-2=6
    b1 = np.array([[0, 0, 0, 2, 2, 1, 0.0]], dtype=np.float32)
    b2 = np.array([[1, 0, 0, 2, 2, 1, 0.0]], dtype=np.float32)
    assert float(rotated_iou_bev(b1, b2)[0, 0]) == pytest.approx(2.0 / 6.0, abs=1e-5)


def test_rotated_45_cross():
    # square 2x2 at origin vs same square rotated 45 deg:
    # intersection is a regular octagon, area = 8*(sqrt(2)-1)
    b1 = np.array([[0, 0, 0, 2, 2, 1, 0.0]], dtype=np.float32)
    b2 = np.array([[0, 0, 0, 2, 2, 1, np.pi / 4]], dtype=np.float32)
    inter = 8 * (np.sqrt(2) - 1)
    expect = inter / (8 - inter)
    assert float(rotated_iou_bev(b1, b2)[0, 0]) == pytest.approx(expect, abs=1e-4)


def test_contained_box():
    b1 = np.array([[0, 0, 0, 4, 4, 1, 0.2]], dtype=np.float32)
    b2 = np.array([[0, 0, 0, 2, 2, 1, 0.9]], dtype=np.float32)
    assert float(rotated_iou_bev(b1, b2)[0, 0]) == pytest.approx(4.0 / 16.0, abs=1e-4)


def test_random_vs_oracle(rng):
    b1 = _random_boxes(rng, 24, span=6.0)  # small span -> many overlaps
    b2 = _random_boxes(rng, 16, span=6.0)
    got = np.asarray(rotated_iou_bev(b1, b2))
    want = oracle_iou_bev(b1, b2)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_chunked_matches_dense(rng):
    b1 = _random_boxes(rng, 100, span=8.0)
    b2 = _random_boxes(rng, 7, span=8.0)
    dense = np.asarray(rotated_iou_bev(b1, b2))
    chunked = np.asarray(rotated_iou_bev_chunked(b1, b2, chunk=32))
    np.testing.assert_allclose(chunked, dense, atol=1e-6)


def test_degenerate_zero_size_box():
    # zero-size boxes must give IoU 0 against anything (incl. themselves),
    # never NaN or >1 (found by verify probe on the candidate-hull method)
    degen = np.array([[0, 0, 0, 0.0, 0.0, 0.0, 0.0],
                      [0, 0, 0, 2.0, 2.0, 1.0, 0.3]], dtype=np.float32)
    iou = np.asarray(rotated_iou_bev(degen, degen))
    assert not np.isnan(iou).any()
    assert iou[0, 0] == 0.0 and iou[0, 1] == 0.0 and iou[1, 0] == 0.0
    assert iou[1, 1] == pytest.approx(1.0, abs=1e-5)
    assert np.all(iou <= 1.0) and np.all(iou >= 0.0)


def test_iou3d_z_overlap():
    b1 = np.array([[0, 0, 0.0, 2, 2, 2, 0.0]], dtype=np.float32)
    b2 = np.array([[0, 0, 1.0, 2, 2, 2, 0.0]], dtype=np.float32)
    # BEV identical (area 4); z overlap 1 of 2 -> inter 4, union 8+8-4=12
    assert float(iou_3d(b1, b2)[0, 0]) == pytest.approx(4.0 / 12.0, abs=1e-4)


def test_iou3d_reduces_to_bev_when_same_z(rng):
    b = _random_boxes(rng, 10, span=5.0)
    b[:, 2] = 0.0
    b[:, 5] = 2.0
    np.testing.assert_allclose(
        np.asarray(iou_3d(b, b)), np.asarray(rotated_iou_bev(b, b)), atol=1e-4
    )


def test_self_iou_is_one_at_far_coordinates():
    """Regression: an edge lying exactly ON a clip plane must never be
    classified as a crossing. XLA's fma fusion leaves layout-dependent
    ~1e-7-relative remainders in nd = d x n for coincident edges, and the
    per-pair re-centering of far-away boxes adds ~1e-5-relative noise — an
    ABSOLUTE eps let t* become the ratio of two rounding remainders
    (observed self-IoU as low as 0.17 for boxes at +-90 m). The thresholds
    are scale-relative now."""
    rng = np.random.default_rng(0)
    n = 257
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(-90, 90, n)
    boxes[:, 1] = rng.uniform(-90, 90, n)
    boxes[:, 3] = rng.uniform(0.3, 3, n)
    boxes[:, 4] = rng.uniform(0.5, 13, n)
    boxes[:, 5] = rng.uniform(0.4, 4, n)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    bj = jnp.asarray(boxes)
    dense = np.asarray(rotated_iou_bev(bj, bj))
    assert np.isfinite(dense).all()
    np.testing.assert_allclose(np.diag(dense), 1.0, atol=1e-5)
    # symmetric within tolerance
    np.testing.assert_allclose(dense, dense.T, atol=2e-4)
