"""Property-based tests (hypothesis) — the reference SDK's testing style
(nuscenes-devkit/tests/test_data_classes.py uses @given array round-trips)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lyft3d_tpu.core.box import Box
from lyft3d_tpu.core.quaternion import (
    quat_from_yaw,
    quat_inverse,
    quat_multiply,
    quat_normalize,
    quat_to_rotation_matrix,
    quaternion_yaw,
)
from lyft3d_tpu.core.geometry import transform_matrix

finite = st.floats(-100.0, 100.0, allow_nan=False)
yaws = st.floats(-np.pi + 1e-6, np.pi - 1e-6, allow_nan=False)
sizes = st.floats(0.1, 20.0, allow_nan=False)


@settings(max_examples=50, deadline=None)
@given(yaws)
def test_yaw_roundtrip(yaw):
    assert abs(quaternion_yaw(quat_from_yaw(yaw)) - yaw) < 1e-9


@settings(max_examples=50, deadline=None)
@given(st.lists(finite, min_size=4, max_size=4))
def test_quat_inverse_property(q):
    q = np.asarray(q)
    if np.linalg.norm(q) < 1e-3:
        return
    ident = quat_multiply(q, quat_inverse(q))
    np.testing.assert_allclose(ident, [1, 0, 0, 0], atol=1e-9)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite, min_size=3, max_size=3), yaws)
def test_transform_matrix_inverse(t, yaw):
    q = quat_from_yaw(yaw)
    fwd = transform_matrix(t, q)
    inv = transform_matrix(t, q, inverse=True)
    np.testing.assert_allclose(fwd @ inv, np.eye(4), atol=1e-9)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(finite, min_size=3, max_size=3),
    st.lists(sizes, min_size=3, max_size=3),
    yaws,
    st.lists(finite, min_size=3, max_size=3),
    yaws,
)
def test_box_translate_rotate_roundtrip(center, wlh, yaw, t, rot_yaw):
    """The reference's hypothesis Box round-trip (test_data_classes.py)."""
    box = Box(center=center, wlh=wlh, orientation=quat_from_yaw(yaw))
    ref = box.copy()
    q = quat_from_yaw(rot_yaw)
    box.rotate(q).translate(np.asarray(t))
    box.translate(-np.asarray(t)).rotate(quat_inverse(q))
    np.testing.assert_allclose(box.center, ref.center, atol=1e-6)
    np.testing.assert_allclose(box.corners(), ref.corners(), atol=1e-6)


@settings(max_examples=30, deadline=None)
@given(st.lists(finite, min_size=4, max_size=4))
def test_normalize_is_unit(q):
    q = np.asarray(q)
    n = quat_normalize(q)
    assert abs(np.linalg.norm(n) - 1.0) < 1e-9
    r = quat_to_rotation_matrix(n)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
