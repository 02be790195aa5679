"""PointNet++ op tests: FPS (jnp + Pallas parity), ball query, grouping,
3-NN interpolation, RoI-pool3D — kernel-vs-reference style (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lyft3d_tpu.ops.pointnet2 import (
    ball_query,
    fps_pallas,
    furthest_point_sample,
    group_points,
    roi_pool3d,
    three_interpolate,
    three_nn,
)


def fps_numpy(points, valid, npoint):
    n = len(points)
    dists = np.where(valid, 1e10, -1.0)
    start = int(np.argmax(valid))
    sel = [start]
    last = start
    for i in range(1, npoint):
        d = np.sum((points - points[last]) ** 2, axis=-1)
        dists = np.minimum(dists, np.where(valid, d, -1.0))
        last = int(np.argmax(dists))
        sel.append(last)
    return np.array(sel)


class TestFPS:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(128, 3).astype(np.float32)
        valid = np.ones(128, bool)
        got = np.asarray(furthest_point_sample(jnp.array(pts), jnp.array(valid), 16))
        want = fps_numpy(pts, valid, 16)
        np.testing.assert_array_equal(got, want)

    def test_pallas_matches_jnp(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(256, 3).astype(np.float32)
        valid = rng.rand(256) > 0.2
        a = np.asarray(furthest_point_sample(jnp.array(pts), jnp.array(valid), 32))
        b = np.asarray(fps_pallas(jnp.array(pts), jnp.array(valid), 32, interpret=True))
        np.testing.assert_array_equal(a, b)

    def test_skips_invalid(self):
        pts = np.array([[0, 0, 0], [100, 0, 0], [0, 100, 0], [50, 50, 0]], np.float32)
        valid = np.array([True, True, True, False])
        sel = np.asarray(furthest_point_sample(jnp.array(pts), jnp.array(valid), 3))
        assert 3 not in sel
        assert set(sel) == {0, 1, 2}

    def test_spread(self):
        # FPS of a 2-cluster cloud must pick from both clusters early.
        rng = np.random.RandomState(2)
        a = rng.randn(100, 3) * 0.1
        b = rng.randn(100, 3) * 0.1 + 10.0
        pts = np.concatenate([a, b]).astype(np.float32)
        sel = np.asarray(
            furthest_point_sample(jnp.array(pts), jnp.ones(200, bool), 2)
        )
        assert (sel[0] < 100) != (sel[1] < 100)


class TestBallQuery:
    def test_basic(self):
        pts = np.array([[0, 0, 0], [0.1, 0, 0], [5, 5, 5], [0.2, 0, 0]], np.float32)
        centers = np.array([[0, 0, 0]], np.float32)
        idx, count = ball_query(jnp.array(centers), jnp.array(pts),
                                jnp.ones(4, bool), radius=1.0, nsample=3)
        assert int(count[0]) == 3
        assert set(np.asarray(idx)[0].tolist()) == {0, 1, 3}

    def test_padding_repeats_first(self):
        pts = np.array([[0, 0, 0], [9, 9, 9]], np.float32)
        centers = np.array([[0, 0, 0]], np.float32)
        idx, count = ball_query(jnp.array(centers), jnp.array(pts),
                                jnp.ones(2, bool), radius=1.0, nsample=4)
        assert int(count[0]) == 1
        assert np.asarray(idx)[0].tolist() == [0, 0, 0, 0]

    def test_invalid_excluded(self):
        pts = np.array([[0, 0, 0], [0.1, 0, 0]], np.float32)
        centers = np.array([[0, 0, 0]], np.float32)
        idx, count = ball_query(jnp.array(centers), jnp.array(pts),
                                jnp.array([True, False]), radius=1.0, nsample=2)
        assert int(count[0]) == 1

    def test_grouping_gather_and_grad(self):
        feats = jnp.arange(12.0).reshape(4, 3)
        idx = jnp.array([[0, 2], [3, 3]], jnp.int32)
        out = group_points(feats, idx)
        assert out.shape == (2, 2, 3)
        np.testing.assert_allclose(np.asarray(out[0, 1]), [6, 7, 8])
        g = jax.grad(lambda f: group_points(f, idx).sum())(feats)
        np.testing.assert_allclose(np.asarray(g[3]), [2, 2, 2])  # used twice


class TestThreeNN:
    def test_exact_neighbors(self):
        known = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]], np.float32)
        unknown = np.array([[0.1, 0.1, 0]], np.float32)
        d, idx = three_nn(jnp.array(unknown), jnp.array(known), jnp.ones(4, bool))
        assert set(np.asarray(idx)[0].tolist()) == {0, 1, 2}

    def test_interpolation_weights(self):
        # Unknown coincides with a known point → its feature dominates.
        known = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
        feats = jnp.array([[10.0], [20.0], [30.0]])
        unknown = np.array([[0, 0, 0]], np.float32)
        d, idx = three_nn(jnp.array(unknown), jnp.array(known), jnp.ones(3, bool))
        out = three_interpolate(feats, idx, d)
        np.testing.assert_allclose(float(out[0, 0]), 10.0, atol=1e-3)

    def test_midpoint_average(self):
        known = np.array([[0, 0, 0], [2, 0, 0], [100, 0, 0]], np.float32)
        feats = jnp.array([[0.0], [4.0], [1000.0]])
        unknown = np.array([[1, 0, 0]], np.float32)
        d, idx = three_nn(jnp.array(unknown), jnp.array(known), jnp.ones(3, bool))
        out = three_interpolate(feats, idx, d)
        assert abs(float(out[0, 0]) - 2.0) < 0.1


class TestRoIPool3D:
    def test_membership_and_counts(self):
        rng = np.random.RandomState(3)
        inside = rng.uniform(-0.4, 0.4, (20, 3)) * [4, 2, 1.5] + [5, 5, 0]
        outside = rng.uniform(20, 30, (30, 3))
        pts = np.concatenate([inside, outside]).astype(np.float32)
        feats = np.arange(50, dtype=np.float32)[:, None]
        boxes = jnp.array([[5, 5, 0, 2, 4, 1.5, 0.0], [40, 40, 0, 2, 4, 1.5, 0.0]],
                          jnp.float32)
        pooled, count, empty = roi_pool3d(
            jnp.array(pts), jnp.array(feats), jnp.ones(50, bool), boxes, num_sampled=32
        )
        assert int(count[0]) == 20 and not bool(empty[0])
        assert int(count[1]) == 0 and bool(empty[1])
        assert pooled.shape == (2, 32, 4)
        np.testing.assert_allclose(np.asarray(pooled[1]), 0.0)
        # Pooled xyz of box 0 all inside the box.
        xyz = np.asarray(pooled[0, :20, :3])
        assert np.all(np.abs(xyz[:, 0] - 5) <= 2.01)
        assert np.all(np.abs(xyz[:, 1] - 5) <= 1.01)

    def test_rotated_box(self):
        pts = np.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]], np.float32)
        feats = np.zeros((2, 1), np.float32)
        # Long axis along y after 90° yaw: (0,2,0) inside, (2,0,0) outside.
        boxes = jnp.array([[0, 0, 0, 1.0, 6.0, 2.0, np.pi / 2]], jnp.float32)
        _, count, _ = roi_pool3d(jnp.array(pts), jnp.array(feats),
                                 jnp.ones(2, bool), boxes, num_sampled=4)
        assert int(count[0]) == 1


class TestApproxBranchPlumbing:
    """The approx_min_k branch's lane-interleave must preserve first-k
    SEMANTICS: key values stay original indices, so on a backend where
    approx_min_k is exact (CPU) the branch must equal the exact path
    bit-for-bit — pinning the value mapping of the (n/g, g) transpose
    (ADVICE r4: no test exercised this branch). TPU recall is measured
    by scripts/measure_approx_recall.py (numbers in ROADMAP)."""

    def test_interleaved_branch_matches_exact(self, monkeypatch):
        from lyft3d_tpu.ops import pointnet2 as p2

        monkeypatch.setattr(p2, "_use_approx", lambda n: n >= 512)
        rng = np.random.RandomState(0)
        n, s, k = 600, 40, 8  # n NOT a multiple of the interleave pitch
        pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
        pts = pts[np.argsort(pts[:, 0])]  # index-clustered neighborhoods
        valid = rng.rand(n) < 0.9
        centers = jnp.asarray(pts[:s])
        idx_a, cnt_a = p2.ball_query(
            centers, jnp.asarray(pts), jnp.asarray(valid), 3.0, k
        )
        monkeypatch.setattr(p2, "_use_approx", lambda n: False)
        idx_e, cnt_e = p2.ball_query(
            centers, jnp.asarray(pts), jnp.asarray(valid), 3.0, k
        )
        np.testing.assert_array_equal(np.asarray(cnt_a), np.asarray(cnt_e))
        np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_e))


class TestGridBallQuery:
    """grid_multi_radius_ball_query == multi_radius_ball_query when no
    cell overflows (cap ample): the 3x3 neighbor cover at cell size
    max(radii) sees every in-radius point, and selection is
    first-k-by-index over those candidates — the exact contract."""

    def _cloud(self, n=500, seed=0):
        rng = np.random.RandomState(seed)
        pts = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
        pts[:, 1] = rng.uniform(-2, 0, n)  # KITTI-rect-like: y = height
        valid = rng.rand(n) < 0.9
        return jnp.asarray(pts), jnp.asarray(valid)

    def test_matches_exact(self):
        from lyft3d_tpu.ops.pointnet2 import (
            grid_multi_radius_ball_query,
            multi_radius_ball_query,
        )

        pts, valid = self._cloud()
        centers = pts[:64]
        radii, ks = (1.5, 3.0), (8, 16)
        ref = multi_radius_ball_query(centers, pts, valid, radii, ks)
        got = grid_multi_radius_ball_query(
            centers, pts, valid, radii, ks,
            bounds=((-20.0, 20.0), (-20.0, 20.0)), plane=(0, 2),
            cell_cap=64,
        )
        for (gi, gc), (ri, rc) in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(gc), np.asarray(rc))
            np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))

    def test_out_of_bounds_clipping(self):
        """Centers/points beyond the static bounds clip into edge cells;
        true neighbors must still be found (convex-hull argument)."""
        from lyft3d_tpu.ops.pointnet2 import (
            grid_multi_radius_ball_query,
            multi_radius_ball_query,
        )

        rng = np.random.RandomState(3)
        pts = rng.uniform(-30, 30, (400, 3)).astype(np.float32)
        valid = np.ones((400,), bool)
        centers = jnp.asarray(pts[:32])
        ref = multi_radius_ball_query(
            centers, jnp.asarray(pts), jnp.asarray(valid), (2.0,), (8,)
        )
        got = grid_multi_radius_ball_query(
            centers, jnp.asarray(pts), jnp.asarray(valid), (2.0,), (8,),
            bounds=((-10.0, 10.0), (-10.0, 10.0)), plane=(0, 2),
            cell_cap=400,
        )
        for (gi, gc), (ri, rc) in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(gc), np.asarray(rc))
            np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
