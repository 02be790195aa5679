"""Golden-value + property tests for rotated IoU and NMS.

Style follows the reference's metric tests (nuscenes-devkit/tests/test_map.py:
exact expected IoUs for hand-constructed rotated boxes) plus Monte-Carlo
cross-checks against a brute-force point-sampling estimate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lyft3d_tpu.ops.box_ops import (
    box_corners_2d,
    box_corners_3d,
    corners_to_standup_2d,
    decode_boxes,
    encode_boxes,
    limit_period,
)
from lyft3d_tpu.ops.nms import nms_mask_from_iou, rotated_nms, select_top_k, standup_nms
from lyft3d_tpu.ops.rotated_iou import (
    polygon_intersection_area,
    rotated_iou_3d,
    rotated_iou_bev,
    rotated_overlap_bev,
)


def bev(x, y, w, l, yaw):
    return jnp.array([[x, y, w, l, yaw]], dtype=jnp.float32)


class TestCorners:
    def test_axis_aligned_corners(self):
        c = np.asarray(box_corners_2d(bev(0, 0, 2, 4, 0.0)))[0]
        # l=4 along x, w=2 along y
        assert set(map(tuple, np.round(c, 6))) == {
            (2.0, 1.0),
            (-2.0, 1.0),
            (-2.0, -1.0),
            (2.0, -1.0),
        }

    def test_ccw_orientation(self):
        c = np.asarray(box_corners_2d(bev(1, 2, 2, 3, 0.7)))[0]
        area2 = 0.0
        for i in range(4):
            j = (i + 1) % 4
            area2 += c[i, 0] * c[j, 1] - c[j, 0] * c[i, 1]
        assert area2 > 0  # CCW → positive shoelace

    def test_corners_3d_shape_and_z(self):
        boxes = jnp.array([[0, 0, 5, 2, 4, 2, 0.3]], dtype=jnp.float32)
        c = np.asarray(box_corners_3d(boxes))[0]
        assert c.shape == (8, 3)
        np.testing.assert_allclose(c[:4, 2], 4.0, atol=1e-6)
        np.testing.assert_allclose(c[4:, 2], 6.0, atol=1e-6)

    def test_standup(self):
        c = box_corners_2d(bev(0, 0, 2, 2, np.pi / 4))
        s = np.asarray(corners_to_standup_2d(c))[0]
        r = np.sqrt(2)
        np.testing.assert_allclose(s, [-r, -r, r, r], atol=1e-6)


class TestRotatedIoU:
    def test_identical_boxes(self):
        b = bev(1.0, 2.0, 2.0, 3.0, 0.4)
        iou = np.asarray(rotated_iou_bev(b, b))
        np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)

    def test_disjoint(self):
        iou = np.asarray(rotated_iou_bev(bev(0, 0, 1, 1, 0), bev(10, 10, 1, 1, 0.5)))
        np.testing.assert_allclose(iou, [[0.0]], atol=1e-7)

    def test_axis_aligned_half_overlap(self):
        # Two 2x2 squares offset by 1 in x: inter=2, union=6 → IoU=1/3.
        iou = np.asarray(rotated_iou_bev(bev(0, 0, 2, 2, 0), bev(1, 0, 2, 2, 0)))
        np.testing.assert_allclose(iou, [[1 / 3]], atol=1e-6)

    def test_rotated_45_square_golden(self):
        # Unit square centered at origin vs the same square rotated 45°:
        # intersection is a regular octagon with area 8*(sqrt(2)-1)/2 ≈ 0.8284.
        inter = np.asarray(
            rotated_overlap_bev(bev(0, 0, 1, 1, 0), bev(0, 0, 1, 1, np.pi / 4))
        )[0, 0]
        expected = 2 * (np.sqrt(2) - 1)
        np.testing.assert_allclose(inter, expected, atol=1e-6)

    def test_contained_box(self):
        inter = np.asarray(
            rotated_overlap_bev(bev(0, 0, 4, 4, 0.3), bev(0, 0, 1, 2, 1.1))
        )[0, 0]
        np.testing.assert_allclose(inter, 2.0, atol=1e-6)

    def test_rotation_invariance(self):
        rng = np.random.RandomState(7)
        b1 = rng.uniform(-1, 1, size=5).astype(np.float32)
        b1[2:4] = np.abs(b1[2:4]) + 1.0
        b2 = rng.uniform(-1, 1, size=5).astype(np.float32)
        b2[2:4] = np.abs(b2[2:4]) + 1.0
        base = float(rotated_iou_bev(jnp.array([b1]), jnp.array([b2]))[0, 0])
        # Rotate both boxes (and centers) by a global angle: IoU must not change.
        theta = 0.9
        c, s = np.cos(theta), np.sin(theta)

        def rot(b):
            b = b.copy()
            x, y = b[0], b[1]
            b[0], b[1] = c * x - s * y, s * x + c * y
            b[4] += theta
            return b

        rotated = float(
            rotated_iou_bev(jnp.array([rot(b1)]), jnp.array([rot(b2)]))[0, 0]
        )
        np.testing.assert_allclose(rotated, base, atol=1e-5)

    def test_monte_carlo_cross_check(self):
        rng = np.random.RandomState(11)
        for _ in range(5):
            boxes = rng.uniform(-1, 1, size=(2, 5)).astype(np.float32)
            boxes[:, 2:4] = rng.uniform(1.0, 3.0, size=(2, 2))
            boxes[:, 4] = rng.uniform(-np.pi, np.pi, size=2)
            inter = float(
                rotated_overlap_bev(jnp.array(boxes[:1]), jnp.array(boxes[1:]))[0, 0]
            )
            # Brute force: sample points, count those inside both.
            pts = rng.uniform(-4, 4, size=(200_000, 2))

            def inside(b):
                d = pts - b[:2]
                ca, sa = np.cos(b[4]), np.sin(b[4])
                lx = ca * d[:, 0] + sa * d[:, 1]
                ly = -sa * d[:, 0] + ca * d[:, 1]
                return (np.abs(lx) <= b[3] / 2) & (np.abs(ly) <= b[2] / 2)

            mc = np.mean(inside(boxes[0]) & inside(boxes[1])) * 64.0
            assert abs(inter - mc) < 0.12, (inter, mc)

    def test_iou3d_height_overlap(self):
        b1 = jnp.array([[0, 0, 0, 2, 2, 2, 0]], dtype=jnp.float32)
        b2 = jnp.array([[0, 0, 1, 2, 2, 2, 0]], dtype=jnp.float32)
        # Same footprint, z offset 1 → inter vol = 4, union = 12 → 1/3.
        iou = np.asarray(rotated_iou_3d(b1, b2))
        np.testing.assert_allclose(iou, [[1 / 3]], atol=1e-6)

    def test_polygon_intersection_symmetry(self):
        rng = np.random.RandomState(13)
        b1 = bev(*rng.uniform(0.5, 2, size=5))
        b2 = bev(*rng.uniform(0.5, 2, size=5))
        c1 = box_corners_2d(b1)[0]
        c2 = box_corners_2d(b2)[0]
        a12 = float(polygon_intersection_area(c1, c2))
        a21 = float(polygon_intersection_area(c2, c1))
        np.testing.assert_allclose(a12, a21, atol=1e-5)


class TestNMS:
    def test_simple_suppression(self):
        boxes = jnp.array(
            [
                [0, 0, 2, 2, 0.0],
                [0.1, 0.0, 2, 2, 0.0],  # heavy overlap with #0
                [10, 10, 2, 2, 0.0],
            ],
            dtype=jnp.float32,
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        keep = np.asarray(rotated_nms(boxes, scores, iou_threshold=0.5))
        assert keep.tolist() == [True, False, True]

    def test_score_order_wins(self):
        boxes = jnp.array([[0, 0, 2, 2, 0.0], [0.1, 0.0, 2, 2, 0.0]], dtype=jnp.float32)
        scores = jnp.array([0.5, 0.9])
        keep = np.asarray(rotated_nms(boxes, scores, iou_threshold=0.5))
        assert keep.tolist() == [False, True]

    def test_valid_mask(self):
        boxes = jnp.array([[0, 0, 2, 2, 0.0], [5, 5, 2, 2, 0.0]], dtype=jnp.float32)
        scores = jnp.array([0.9, 0.8])
        keep = np.asarray(
            rotated_nms(boxes, scores, 0.5, valid=jnp.array([False, True]))
        )
        assert keep.tolist() == [False, True]

    def test_chain_suppression_not_transitive(self):
        # A suppresses B; C overlaps B but not A → C must be kept.
        boxes = jnp.array(
            [[0, 0, 2, 2, 0.0], [1.2, 0, 2, 2, 0.0], [2.4, 0, 2, 2, 0.0]],
            dtype=jnp.float32,
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        iou = rotated_iou_bev(boxes, boxes)
        assert float(iou[0, 1]) > 0.2 and float(iou[0, 2]) < 0.2
        keep = np.asarray(nms_mask_from_iou(iou, scores, iou_threshold=0.2))
        assert keep.tolist() == [True, False, True]

    def test_standup_nms_runs(self):
        boxes = jnp.array([[0, 0, 2, 2, 0.3], [0.05, 0, 2, 2, 0.3]], dtype=jnp.float32)
        keep = np.asarray(standup_nms(boxes, jnp.array([0.9, 0.8]), 0.5))
        assert keep.tolist() == [True, False]

    def test_select_top_k(self):
        keep = jnp.array([True, False, True, True])
        scores = jnp.array([0.1, 0.9, 0.8, 0.3])
        idx, valid = select_top_k(keep, scores, 3)
        assert np.asarray(valid).tolist() == [True, True, True]
        assert np.asarray(idx).tolist() == [2, 3, 0]


class TestBoxCoder:
    def test_encode_decode_roundtrip(self):
        rng = np.random.RandomState(17)
        anchors = np.zeros((64, 7), dtype=np.float32)
        anchors[:, :3] = rng.uniform(-10, 10, size=(64, 3))
        anchors[:, 3:6] = rng.uniform(1, 4, size=(64, 3))
        anchors[:, 6] = rng.uniform(-np.pi, np.pi, size=64)
        boxes = anchors + rng.uniform(-0.5, 0.5, size=(64, 7)).astype(np.float32)
        for vec in (False, True):
            for smooth in (False, True):
                enc = encode_boxes(
                    jnp.array(boxes), jnp.array(anchors), vec, smooth
                )
                dec = np.asarray(decode_boxes(enc, jnp.array(anchors), vec, smooth))
                np.testing.assert_allclose(
                    dec[:, :6], boxes[:, :6], rtol=1e-4, atol=1e-3
                )
                # Vector angle encoding wraps yaw into [-pi, pi]; compare on
                # the circle.
                ang_err = np.abs(np.angle(np.exp(1j * (dec[:, 6] - boxes[:, 6]))))
                assert np.max(ang_err) < 1e-3

    def test_limit_period(self):
        vals = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi / 2, 2 * np.pi])
        out = np.asarray(limit_period(vals, 0.5, np.pi))
        assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)
        # limit_period(x) ≡ x (mod π)
        np.testing.assert_allclose(
            np.mod(out - np.asarray(vals), np.pi), 0.0, atol=1e-5
        )


def test_fixpoint_greedy_equals_sequential_greedy():
    """The while-loop fixpoint NMS must match a literal sequential greedy
    walk on random score/IoU instances (incl. suppression chains)."""
    import numpy as np
    import jax.numpy as jnp

    from lyft3d_tpu.ops.nms import nms_mask_from_iou

    rng = np.random.RandomState(0)
    for trial in range(10):
        n = 64
        scores = rng.rand(n)
        iou = rng.rand(n, n) * 0.9
        iou = (iou + iou.T) / 2
        np.fill_diagonal(iou, 1.0)
        valid = rng.rand(n) < 0.9
        thr = 0.4

        order = np.argsort(-np.where(valid, scores, -np.inf))
        suppressed = np.zeros(n, bool)
        keep = np.zeros(n, bool)
        for i in order:
            if not valid[i] or suppressed[i]:
                continue
            keep[i] = True
            suppressed |= iou[i] > thr
            suppressed[i] = False
        got = np.asarray(
            nms_mask_from_iou(jnp.asarray(iou), jnp.asarray(scores), thr,
                              jnp.asarray(valid))
        )
        np.testing.assert_array_equal(got, keep, err_msg=f"trial {trial}")


def test_fixpoint_greedy_alternating_chain():
    """Descending-score chain where each box overlaps only its neighbor:
    greedy keeps every other box — the worst case for fixpoint depth."""
    import numpy as np
    import jax.numpy as jnp

    from lyft3d_tpu.ops.nms import nms_mask_from_iou

    n = 40
    iou = np.eye(n)
    for i in range(n - 1):
        iou[i, i + 1] = iou[i + 1, i] = 0.9
    scores = np.linspace(1.0, 0.5, n)
    got = np.asarray(
        nms_mask_from_iou(jnp.asarray(iou), jnp.asarray(scores), 0.5)
    )
    expect = np.array([i % 2 == 0 for i in range(n)])
    np.testing.assert_array_equal(got, expect)
