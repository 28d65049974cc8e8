import numpy as np
import pytest

from tpu_pillars.geometry import (
    Box3D, Pose, box_corners_bev, compose, inverse, quat_from_axis_angle,
    quat_from_yaw, quat_inverse, quat_multiply, quat_rotate,
    quat_to_rotation_matrix, transform_points, yaw_from_quat,
)


def test_quat_yaw_roundtrip():
    yaws = np.linspace(-np.pi + 1e-6, np.pi - 1e-6, 17)
    q = quat_from_yaw(yaws)
    np.testing.assert_allclose(yaw_from_quat(q), yaws, atol=1e-12)


def test_quat_rotate_matches_matrix(rng):
    q = quat_from_axis_angle(rng.normal(size=(5, 3)), rng.uniform(-np.pi, np.pi, 5))
    v = rng.normal(size=(5, 3))
    R = quat_to_rotation_matrix(q)
    np.testing.assert_allclose(quat_rotate(q, v), np.einsum("nij,nj->ni", R, v), atol=1e-12)


def test_quat_multiply_composes_rotation(rng):
    q1 = quat_from_axis_angle(rng.normal(size=3), 0.7)
    q2 = quat_from_axis_angle(rng.normal(size=3), -1.3)
    v = rng.normal(size=3)
    np.testing.assert_allclose(
        quat_rotate(quat_multiply(q1, q2), v), quat_rotate(q1, quat_rotate(q2, v)),
        atol=1e-12,
    )


def test_quat_inverse(rng):
    q = quat_from_axis_angle(rng.normal(size=3), 2.1)
    ident = quat_multiply(q, quat_inverse(q))
    np.testing.assert_allclose(ident, [1, 0, 0, 0], atol=1e-12)


def test_pose_compose_inverse(rng):
    a = Pose(quat_from_axis_angle(rng.normal(size=3), 0.5), rng.normal(size=3))
    b = Pose(quat_from_axis_angle(rng.normal(size=3), -0.9), rng.normal(size=3))
    pts = rng.normal(size=(10, 5))  # xyz + 2 feature cols
    via_compose = transform_points(compose(a, b), pts)
    via_seq = transform_points(a, transform_points(b, pts))
    np.testing.assert_allclose(via_compose, via_seq, atol=1e-9)
    back = transform_points(inverse(a), transform_points(a, pts))
    np.testing.assert_allclose(back, pts, atol=1e-9)
    # feature columns untouched
    np.testing.assert_array_equal(via_compose[:, 3:], pts[:, 3:])


def test_box_corners_axis_aligned():
    b = Box3D(center=[1.0, 2.0, 0.0], wlh=[2.0, 4.0, 1.0], yaw=0.0)
    corners = b.corners_bev()
    # length 4 along x (heading), width 2 along y
    expect = np.array([[3, 3], [-1, 3], [-1, 1], [3, 1]])
    np.testing.assert_allclose(corners, expect, atol=1e-12)


def test_box_corners_rotation_90deg():
    b = Box3D(center=[0.0, 0.0, 0.0], wlh=[2.0, 4.0, 1.0], yaw=np.pi / 2)
    corners = b.corners_bev()
    # after +90deg, heading is +y: extents swap
    assert corners[:, 0].max() == pytest.approx(1.0)
    assert corners[:, 1].max() == pytest.approx(2.0)


def test_box_transform_roundtrip(rng):
    b = Box3D(center=[5.0, -3.0, 1.0], wlh=[2, 4, 1.5], yaw=0.3, label="car", score=0.9)
    q = quat_from_yaw(1.1)
    t = np.array([10.0, -2.0, 0.5])
    fwd = b.transformed(q, t)
    # corners must transform consistently
    expect = quat_rotate(np.broadcast_to(q, (4, 4)),
                         np.concatenate([b.corners_bev(), np.zeros((4, 1))], 1)) + t
    np.testing.assert_allclose(fwd.corners_bev(), expect[:, :2], atol=1e-9)
    back = fwd.transformed(quat_inverse(q), -quat_rotate(quat_inverse(q), t))
    np.testing.assert_allclose(back.center, b.center, atol=1e-9)
    np.testing.assert_allclose(back.yaw, b.yaw, atol=1e-9)
    assert fwd.label == "car" and fwd.score == 0.9


def test_box_array_roundtrip():
    b = Box3D(center=[1, 2, 3], wlh=[4, 5, 6], yaw=0.7)
    b2 = Box3D.from_array(b.to_array())
    np.testing.assert_allclose(b2.center, b.center)
    np.testing.assert_allclose(b2.wlh, b.wlh)
    assert b2.yaw == pytest.approx(b.yaw)


def test_corners_3d_heights():
    b = Box3D(center=[0, 0, 10.0], wlh=[2, 2, 4.0], yaw=0.0)
    c = b.corners_3d()
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:4, 2], 8.0)
    np.testing.assert_allclose(c[4:, 2], 12.0)
