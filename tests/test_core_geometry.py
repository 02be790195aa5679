"""Unit tests for core quaternion / SE(3) / box math.

Mirrors the coverage style of the reference SDK tests
(nuscenes-devkit/tests/test_geometry_utils.py, test_data_classes.py):
randomized yaw round-trips, transform round-trips, point-in-box cases.
"""

import numpy as np
import pytest

from lyft3d_tpu.core import (
    Box,
    points_in_box,
    quat_from_axis_angle,
    quat_from_yaw,
    quat_inverse,
    quat_multiply,
    quat_rotate,
    quat_to_rotation_matrix,
    quaternion_yaw,
    transform_matrix,
    view_points,
)
from lyft3d_tpu.core.geometry import points_in_boxes


class TestQuaternion:
    def test_yaw_roundtrip_random(self):
        rng = np.random.RandomState(0)
        for yaw in rng.uniform(-np.pi, np.pi, size=100):
            q = quat_from_yaw(yaw)
            assert abs(quaternion_yaw(q) - yaw) < 1e-9

    def test_yaw_with_pitch_roll(self):
        # Yaw extraction must survive composition with pitch/roll (the
        # projection-of-x-axis definition).
        yaw = 0.7
        q = quat_from_yaw(yaw)
        q = quat_multiply(q, quat_from_axis_angle([0, 1, 0], 0.2))
        assert abs(quaternion_yaw(q) - yaw) < 1e-9

    def test_non_unit_quaternion_yaw(self):
        q = 3.1 * quat_from_yaw(1.2)
        assert abs(quaternion_yaw(q) - 1.2) < 1e-9

    def test_multiply_inverse_identity(self):
        rng = np.random.RandomState(1)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        ident = quat_multiply(q, quat_inverse(q))
        np.testing.assert_allclose(ident, [1, 0, 0, 0], atol=1e-12)

    def test_rotation_matrix_orthonormal(self):
        q = quat_from_axis_angle([1, 2, 3], 0.9)
        r = quat_to_rotation_matrix(q)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
        assert abs(np.linalg.det(r) - 1.0) < 1e-12

    def test_rotate_z90(self):
        q = quat_from_yaw(np.pi / 2)
        v = quat_rotate(q, np.array([[1.0, 0.0, 0.0]]))[0]
        np.testing.assert_allclose(v, [0, 1, 0], atol=1e-12)


class TestTransformMatrix:
    def test_forward_inverse_roundtrip(self):
        rng = np.random.RandomState(2)
        t = rng.randn(3)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        fwd = transform_matrix(t, q)
        inv = transform_matrix(t, q, inverse=True)
        np.testing.assert_allclose(fwd @ inv, np.eye(4), atol=1e-12)

    def test_maps_origin_to_translation(self):
        tm = transform_matrix([1, 2, 3], quat_from_yaw(0.5))
        p = tm @ np.array([0, 0, 0, 1.0])
        np.testing.assert_allclose(p[:3], [1, 2, 3], atol=1e-12)


class TestViewPoints:
    def test_identity(self):
        pts = np.random.RandomState(3).randn(3, 10)
        out = view_points(pts, np.eye(3), normalize=False)
        np.testing.assert_allclose(out, pts)

    def test_perspective_normalize(self):
        pts = np.array([[2.0], [4.0], [2.0]])
        out = view_points(pts, np.eye(3), normalize=True)
        np.testing.assert_allclose(out[:, 0], [1.0, 2.0, 1.0])


class TestBox:
    def test_corners_axis_aligned(self):
        box = Box(center=[0, 0, 0], wlh=[2, 4, 6], orientation=[1, 0, 0, 0])
        c = box.corners()
        assert c.shape == (3, 8)
        np.testing.assert_allclose(np.abs(c[0]), 2.0)  # length/2 along x
        np.testing.assert_allclose(np.abs(c[1]), 1.0)  # width/2 along y
        np.testing.assert_allclose(np.abs(c[2]), 3.0)  # height/2 along z

    def test_bottom_corners_z(self):
        box = Box(center=[0, 0, 10], wlh=[2, 2, 4], orientation=[1, 0, 0, 0])
        bc = box.bottom_corners()
        np.testing.assert_allclose(bc[2], 8.0)

    def test_translate_rotate_roundtrip(self):
        rng = np.random.RandomState(4)
        for _ in range(20):
            box = Box(
                center=rng.randn(3),
                wlh=np.abs(rng.randn(3)) + 0.5,
                orientation=quat_from_yaw(rng.uniform(-np.pi, np.pi)),
            )
            ref = box.copy()
            t = rng.randn(3)
            q = quat_from_axis_angle(rng.randn(3), rng.uniform(0, np.pi))
            box.rotate(q).translate(t)
            box.translate(-t).rotate(quat_inverse(q))
            np.testing.assert_allclose(box.center, ref.center, atol=1e-9)
            np.testing.assert_allclose(
                quat_to_rotation_matrix(box.orientation),
                quat_to_rotation_matrix(ref.orientation),
                atol=1e-9,
            )

    def test_transform_equals_rotate_translate(self):
        box = Box(center=[1, 2, 0.5], wlh=[1, 2, 1], orientation=quat_from_yaw(0.3))
        other = box.copy()
        q = quat_from_yaw(1.1)
        t = np.array([5.0, -3.0, 0.7])
        box.rotate(q).translate(t)
        other.transform(transform_matrix(t, q))
        np.testing.assert_allclose(box.center, other.center, atol=1e-9)
        np.testing.assert_allclose(box.corners(), other.corners(), atol=1e-9)


class TestPointsInBox:
    def test_basic_inside_outside(self):
        box = Box(center=[0, 0, 0], wlh=[2, 4, 2], orientation=[1, 0, 0, 0])
        pts = np.array(
            [
                [0.0, 1.9, 2.1, 0.0, 0.0],
                [0.0, 0.9, 0.0, 1.1, 0.0],
                [0.0, 0.9, 0.0, 0.0, 1.1],
            ]
        )
        mask = points_in_box(box, pts)
        assert mask.tolist() == [True, True, False, False, False]

    def test_rotated(self):
        box = Box(center=[0, 0, 0], wlh=[1, 4, 1], orientation=quat_from_yaw(np.pi / 2))
        # Length axis now along y: (0, 1.5, 0) is inside, (1.5, 0, 0) is not.
        pts = np.array([[0.0, 1.5], [1.5, 0.0], [0.0, 0.0]])
        mask = points_in_box(box, pts)
        assert mask.tolist() == [True, False]

    def test_wlh_factor(self):
        box = Box(center=[0, 0, 0], wlh=[2, 2, 2], orientation=[1, 0, 0, 0])
        pts = np.array([[1.5], [0.0], [0.0]])
        assert not points_in_box(box, pts)[0]
        assert points_in_box(box, pts, wlh_factor=2.0)[0]

    def test_points_in_boxes_matches_single(self):
        rng = np.random.RandomState(5)
        pts = rng.uniform(-5, 5, size=(200, 3))
        centers = rng.uniform(-3, 3, size=(4, 3))
        wlh = rng.uniform(0.5, 3.0, size=(4, 3))
        yaws = rng.uniform(-np.pi, np.pi, size=4)
        batched = points_in_boxes(pts, centers, wlh, yaws)
        for i in range(4):
            box = Box(center=centers[i], wlh=wlh[i], orientation=quat_from_yaw(yaws[i]))
            single = points_in_box(box, pts.T)
            np.testing.assert_array_equal(batched[i], single)
