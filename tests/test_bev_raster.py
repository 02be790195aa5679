"""BEV rasterizer tests: the three formulations must agree with a numpy
brute-force count, and target polygon fill must match geometric expectations
(the kernel-vs-reference pattern from SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from lyft3d_tpu.ops.bev_raster import (
    DEFAULT_SHAPE,
    DEFAULT_VOXEL_SIZE,
    DEFAULT_Z_OFFSET,
    bev_rasterize_matmul,
    bev_rasterize_pallas,
    bev_rasterize_scatter,
    normalize_bev,
    rasterize_boxes_bev,
    voxel_indices,
)


def numpy_reference_counts(points, valid, shape, voxel_size, z_offset):
    h, w, c = shape
    out = np.zeros(shape, dtype=np.float32)
    for p, ok in zip(points, valid):
        if not ok:
            continue
        col = int(np.floor(p[0] / voxel_size[0] + w / 2))
        row = int(np.floor(p[1] / voxel_size[1] + h / 2))
        ch = int(np.floor((p[2] - z_offset) / voxel_size[2]))
        if 0 <= col < w and 0 <= row < h and 0 <= ch < c:
            out[row, col, ch] += 1
    return out


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(3)
    n = 5000
    pts = np.empty((n, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(-80, 80, n)  # some out of range
    pts[:, 1] = rng.uniform(-80, 80, n)
    pts[:, 2] = rng.uniform(-3, 4, n)
    pts[:, 3] = rng.uniform(0, 100, n)
    valid = rng.rand(n) > 0.1
    return pts, valid


SMALL = (64, 64, 3)


class TestRasterize:
    def test_scatter_matches_numpy(self, cloud):
        pts, valid = cloud
        got = np.asarray(
            bev_rasterize_scatter(
                jnp.array(pts), jnp.array(valid), SMALL, DEFAULT_VOXEL_SIZE, DEFAULT_Z_OFFSET
            )
        )
        want = numpy_reference_counts(pts, valid, SMALL, DEFAULT_VOXEL_SIZE, DEFAULT_Z_OFFSET)
        np.testing.assert_array_equal(got, want)

    def test_sort_matches_scatter(self, cloud):
        from lyft3d_tpu.ops.bev_raster import bev_rasterize_sort

        pts, valid = cloud
        a = bev_rasterize_scatter(jnp.array(pts), jnp.array(valid), SMALL)
        b = bev_rasterize_sort(jnp.array(pts), jnp.array(valid), SMALL)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_matmul_matches_scatter(self, cloud):
        pts, valid = cloud
        a = bev_rasterize_scatter(jnp.array(pts), jnp.array(valid), SMALL)
        b = bev_rasterize_matmul(jnp.array(pts), jnp.array(valid), SMALL, chunk=512)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pallas_matches_scatter(self, cloud):
        pts, valid = cloud
        a = np.asarray(bev_rasterize_scatter(jnp.array(pts), jnp.array(valid), SMALL))
        with pltpu.force_tpu_interpret_mode():
            b = np.asarray(
                bev_rasterize_pallas(jnp.array(pts), jnp.array(valid), SMALL, chunk=512)
            )
        np.testing.assert_array_equal(a, b)

    def test_full_lyft_shape_jits(self, cloud):
        pts, valid = cloud
        f = jax.jit(lambda p, v: bev_rasterize_scatter(p, v, DEFAULT_SHAPE))
        out = f(jnp.array(pts), jnp.array(valid))
        assert out.shape == DEFAULT_SHAPE
        assert float(out.sum()) > 0

    def test_padding_points_ignored(self, cloud):
        pts, valid = cloud
        a = bev_rasterize_scatter(jnp.array(pts), jnp.array(valid), SMALL)
        pts2 = np.concatenate([pts, np.zeros((100, 4), np.float32)])
        valid2 = np.concatenate([valid, np.zeros(100, bool)])
        b = bev_rasterize_scatter(jnp.array(pts2), jnp.array(valid2), SMALL)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_normalize(self):
        counts = jnp.array([0.0, 8.0, 16.0, 64.0])
        np.testing.assert_allclose(
            np.asarray(normalize_bev(counts)), [0.0, 0.5, 1.0, 1.0]
        )

    def test_voxel_indices_bounds(self):
        pts = jnp.array(
            [[0.0, 0.0, 0.0, 0], [1e6, 0.0, 0.0, 0], [0.0, 0.0, 100.0, 0]],
            dtype=jnp.float32,
        )
        _, _, _, inb = voxel_indices(pts, SMALL, DEFAULT_VOXEL_SIZE, DEFAULT_Z_OFFSET)
        assert np.asarray(inb).tolist() == [True, False, False]


class TestBoxTargetRaster:
    def test_axis_aligned_fill(self):
        # Box covering pixel cols 2..5, rows 3..6 (corners in pixel units).
        corners = jnp.array(
            [[[2.0, 3.0], [6.0, 3.0], [6.0, 7.0], [2.0, 7.0]]], dtype=jnp.float32
        )
        out = np.asarray(
            rasterize_boxes_bev(corners, jnp.array([5]), jnp.array([True]), (10, 10))
        )
        assert out[5, 4] == 5
        assert out[3, 2] == 5  # pixel center (2.5, 3.5) inside
        assert out[0, 0] == 0
        assert out[8, 8] == 0
        assert (out == 5).sum() == 16

    def test_overlap_later_box_wins(self):
        c1 = [[0.0, 0.0], [6.0, 0.0], [6.0, 6.0], [0.0, 6.0]]
        c2 = [[3.0, 3.0], [9.0, 3.0], [9.0, 9.0], [3.0, 9.0]]
        corners = jnp.array([c1, c2], dtype=jnp.float32)
        out = np.asarray(
            rasterize_boxes_bev(
                corners, jnp.array([1, 2]), jnp.array([True, True]), (10, 10)
            )
        )
        assert out[1, 1] == 1
        assert out[4, 4] == 2  # overlap → later box
        assert out[8, 8] == 2

    def test_invalid_box_ignored(self):
        corners = jnp.array(
            [[[0.0, 0.0], [9.0, 0.0], [9.0, 9.0], [0.0, 9.0]]], dtype=jnp.float32
        )
        out = np.asarray(
            rasterize_boxes_bev(corners, jnp.array([3]), jnp.array([False]), (10, 10))
        )
        assert out.sum() == 0

    def test_rotated_box_area(self):
        # 45°-rotated square, diag 8, centered at (8, 8) on a 16x16 grid:
        # area 32 px² — filled count should be close.
        cs = np.array([[8 + 4, 8], [8, 8 + 4], [8 - 4, 8], [8, 8 - 4]], np.float32)
        out = np.asarray(
            rasterize_boxes_bev(
                jnp.array(cs[None]), jnp.array([1]), jnp.array([True]), (16, 16)
            )
        )
        assert 24 <= (out == 1).sum() <= 40

    def test_clockwise_corner_order_also_fills(self):
        corners = jnp.array(
            [[[2.0, 3.0], [2.0, 7.0], [6.0, 7.0], [6.0, 3.0]]], dtype=jnp.float32
        )
        out = np.asarray(
            rasterize_boxes_bev(corners, jnp.array([4]), jnp.array([True]), (10, 10))
        )
        assert (out == 4).sum() == 16
