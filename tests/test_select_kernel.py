"""Fused selection kernels == jnp reference formulations (interpret mode).

The kernel-vs-reference pattern of SURVEY.md §4 (RoIAlign test.py style):
same random data through `ops.select_kernel` (interpret=True) and the pure
jnp paths in `ops.pointnet2` (forced onto their exact branch).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lyft3d_tpu.ops import pointnet2 as p2
from lyft3d_tpu.ops.select_kernel import (
    ball_query_fused,
    knn_fused,
    multi_radius_ball_query_fused,
    roi_inside_select_fused,
)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
    valid = rng.rand(300) < 0.9
    return jnp.asarray(pts), jnp.asarray(valid)


class TestBallQueryFused:
    def test_matches_reference(self, cloud):
        pts, valid = cloud
        centers = pts[:40]
        for radius, k in [(2.0, 8), (4.0, 16)]:
            ref_idx, ref_cnt = p2.ball_query(centers, pts, valid, radius, k)
            idx, cnt = ball_query_fused(
                centers, pts, valid, radius, k, interpret=True
            )
            np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
            np.testing.assert_array_equal(np.asarray(cnt), np.asarray(ref_cnt))

    def test_multi_radius(self, cloud):
        pts, valid = cloud
        centers = pts[:40]
        res = multi_radius_ball_query_fused(
            centers, pts, valid, (2.0, 4.0), (8, 16), interpret=True
        )
        for (idx, cnt), (radius, k) in zip(res, [(2.0, 8), (4.0, 16)]):
            ref_idx, ref_cnt = p2.ball_query(centers, pts, valid, radius, k)
            np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
            np.testing.assert_array_equal(np.asarray(cnt), np.asarray(ref_cnt))

    def test_empty_rows(self, cloud):
        pts, valid = cloud
        far = jnp.asarray(np.full((4, 3), 500.0, np.float32))
        idx, cnt = ball_query_fused(far, pts, valid, 1.0, 4, interpret=True)
        np.testing.assert_array_equal(np.asarray(cnt), 0)
        np.testing.assert_array_equal(np.asarray(idx), 0)


class TestKnnFused:
    def test_matches_three_nn(self, cloud):
        pts, valid = cloud
        unknown = jnp.asarray(
            np.random.RandomState(1).uniform(-8, 8, (50, 3)).astype(np.float32)
        )
        ref_d, ref_idx = p2.three_nn(unknown, pts, valid)
        d, idx = knn_fused(unknown, pts, valid, k=3, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(ref_d), rtol=1e-5, atol=1e-5
        )


    def test_fewer_valid_than_k(self, cloud):
        """Rows with < k valid neighbors must emit MISSES (d2 ~ 1e10), not
        silently return lane 0 — otherwise three_interpolate gives a
        padding point full inverse-distance weight (ADVICE r4 low)."""
        pts, _ = cloud
        valid2 = jnp.zeros((pts.shape[0],), bool).at[jnp.array([7, 191])].set(
            True
        )
        unknown = pts[:20]
        ref_d, ref_idx = p2.three_nn(unknown, pts, valid2)
        d, idx = knn_fused(unknown, pts, valid2, k=3, interpret=True)
        # Two real neighbors; the third slot is a miss in both paths.
        np.testing.assert_array_equal(np.asarray(idx[:, :2]),
                                      np.asarray(ref_idx[:, :2]))
        assert (np.asarray(d[:, 2]) > 1e4).all()
        # Interpolated features must agree (the miss gets ~zero weight).
        feats = jnp.asarray(
            np.random.RandomState(3).randn(pts.shape[0], 4).astype(np.float32)
        )
        out_k = p2.three_interpolate(feats, idx, d)
        out_r = p2.three_interpolate(feats, ref_idx, ref_d)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)


class TestRoiSelectFused:
    def test_matches_roi_pool3d_selection(self, cloud):
        pts, valid = cloud
        rng = np.random.RandomState(2)
        boxes = np.column_stack([
            rng.uniform(-6, 6, (5, 3)),
            rng.uniform(2, 6, (5, 3)),
            rng.uniform(-np.pi, np.pi, 5),
        ]).astype(np.float32)
        boxes = jnp.asarray(boxes)
        feats = jnp.zeros((pts.shape[0], 2))
        pooled_ref, cnt_ref, empty_ref = p2.roi_pool3d(
            pts, feats, valid, boxes, num_sampled=16, extra_width=0.5
        )
        idx, cnt = roi_inside_select_fused(
            pts, valid, boxes, num_sampled=16, extra_width=0.5,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))
        got_xyz = np.asarray(pts)[np.asarray(idx)] * (
            np.asarray(cnt) > 0
        )[:, None, None]
        np.testing.assert_allclose(
            got_xyz, np.asarray(pooled_ref)[..., :3], rtol=1e-6
        )
