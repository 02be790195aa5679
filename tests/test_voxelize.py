"""Voxelizer tests against a numpy brute-force reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from lyft3d_tpu.ops.voxelize import VoxelGrid, voxelize

GRID = VoxelGrid(point_cloud_range=(0, 0, 0, 8, 8, 4), voxel_size=(1.0, 1.0, 2.0))


def brute_force(points, valid, grid):
    """voxel id → list of point indices (insertion order by sorted id)."""
    nx, ny, nz = grid.grid_size
    r, vs = grid.point_cloud_range, grid.voxel_size
    vox = {}
    for i, (p, ok) in enumerate(zip(points, valid)):
        if not ok:
            continue
        ix = int(np.floor((p[0] - r[0]) / vs[0]))
        iy = int(np.floor((p[1] - r[1]) / vs[1]))
        iz = int(np.floor((p[2] - r[2]) / vs[2]))
        if not (0 <= ix < nx and 0 <= iy < ny and 0 <= iz < nz):
            continue
        vox.setdefault((iz * ny + iy) * nx + ix, []).append(i)
    return vox


class TestVoxelize:
    def test_matches_brute_force(self):
        rng = np.random.RandomState(0)
        pts = rng.uniform(-1, 9, size=(500, 4)).astype(np.float32)
        valid = rng.rand(500) > 0.1
        out = voxelize(jnp.array(pts), jnp.array(valid), GRID, max_voxels=256,
                       max_points_per_voxel=8)
        want = brute_force(pts, valid, GRID)

        nvalid = int(np.asarray(out["voxel_valid"]).sum())
        assert nvalid == len(want)

        nx, ny, nz = GRID.grid_size
        coords = np.asarray(out["coords"])
        nump = np.asarray(out["num_points"])
        voxels = np.asarray(out["voxels"])
        for s in range(nvalid):
            ix, iy, iz = coords[s]
            fid = (iz * ny + iy) * nx + ix
            assert fid in want
            assert nump[s] == min(len(want[fid]), 8)
            # Every stored point must actually belong to this voxel.
            for j in range(nump[s]):
                p = voxels[s, j]
                assert ix == int(np.floor(p[0] / 1.0))
                assert iy == int(np.floor(p[1] / 1.0))
                assert iz == int(np.floor(p[2] / 2.0))

    def test_max_points_cap(self):
        pts = np.tile(np.array([[0.5, 0.5, 0.5, 1.0]], np.float32), (20, 1))
        out = voxelize(jnp.array(pts), jnp.ones(20, bool), GRID, max_voxels=4,
                       max_points_per_voxel=3)
        assert int(np.asarray(out["voxel_valid"]).sum()) == 1
        assert int(np.asarray(out["num_points"])[0]) == 3

    def test_max_voxels_cap(self):
        # 64 distinct voxels, cap at 10.
        xs, ys = np.meshgrid(np.arange(8) + 0.5, np.arange(8) + 0.5)
        pts = np.stack([xs.ravel(), ys.ravel(), np.full(64, 0.5), np.zeros(64)], -1)
        out = voxelize(jnp.array(pts, jnp.float32), jnp.ones(64, bool), GRID,
                       max_voxels=10, max_points_per_voxel=2)
        assert int(np.asarray(out["voxel_valid"]).sum()) == 10

    def test_overflow_cap_spreads_evenly(self):
        """Voxel-cap overflow keeps an evenly-spread subset of the sorted
        ids (not a spatial-band prefix), with exact per-voxel point counts
        (a skipped neighbor's points never merge into a kept voxel)."""
        xs, ys = np.meshgrid(np.arange(8) + 0.5, np.arange(8) + 0.5)
        pts = np.stack(
            [xs.ravel(), ys.ravel(), np.full(64, 0.5), np.zeros(64)], -1
        )
        pts3 = np.repeat(pts, 3, axis=0)  # 3 points per voxel
        out = voxelize(jnp.array(pts3, jnp.float32), jnp.ones(192, bool),
                       GRID, max_voxels=10, max_points_per_voxel=4)
        v = np.asarray(out["voxel_valid"])
        assert v.sum() == 10
        c = np.asarray(out["coords"])[v]
        # survivors span the whole y range, not just the low-y band
        assert c[:, 1].max() >= 6
        np.testing.assert_array_equal(np.asarray(out["num_points"])[v], 3)
        vox = np.asarray(out["voxels"])[v]
        for i in range(10):
            for j in range(3):
                assert int(vox[i, j, 0]) == c[i, 0]
                assert int(vox[i, j, 1]) == c[i, 1]

    def test_point_voxel_mapping(self):
        pts = np.array(
            [[0.5, 0.5, 0.5, 0], [0.6, 0.6, 0.6, 0], [3.5, 3.5, 0.5, 0], [100, 0, 0, 0]],
            np.float32,
        )
        out = voxelize(jnp.array(pts), jnp.ones(4, bool), GRID, max_voxels=8,
                       max_points_per_voxel=4, need_point_voxel=True)
        pv = np.asarray(out["point_voxel"])
        assert pv[0] == pv[1] != pv[2]
        assert pv[3] == -1  # out of range
        coords = np.asarray(out["coords"])
        assert coords[pv[0]].tolist() == [0, 0, 0]
        assert coords[pv[2]].tolist() == [3, 3, 0]

    def test_all_invalid(self):
        pts = np.zeros((10, 4), np.float32)
        out = voxelize(jnp.array(pts), jnp.zeros(10, bool), GRID, max_voxels=4,
                       max_points_per_voxel=2, need_point_voxel=True)
        assert int(np.asarray(out["voxel_valid"]).sum()) == 0
        assert np.all(np.asarray(out["point_voxel"]) == -1)


class TestBlockFiltering:
    """Height-based ground removal (all.fhd.config:10-13 block_filtering)."""

    def test_ground_points_removed(self):
        from lyft3d_tpu.ops.voxelize import block_filter_mask

        grid = GRID._replace(block_filtering=True, block_factor=1,
                             block_size=4, height_threshold=0.5)
        # Block (0,0): ground at z=0.1 plus two elevated points; block (1,0)
        # (x>=4): ground at z=1.0 with one elevated point.
        pts = np.array([
            [0.5, 0.5, 0.10, 0],   # ground, removed
            [1.5, 1.5, 0.15, 0],   # within 0.5 of block min, removed
            [2.5, 0.5, 1.00, 0],   # 0.9 above block min, kept
            [0.5, 2.5, 3.00, 0],   # kept
            [5.0, 0.5, 1.00, 0],   # other block's ground, removed
            [6.0, 1.0, 1.80, 0],   # 0.8 above ITS block min, kept
        ], np.float32)
        mask = np.asarray(block_filter_mask(jnp.array(pts), jnp.ones(6, bool), grid))
        assert mask.tolist() == [False, False, True, True, False, True]

    def test_wired_through_voxelize_and_invalid_ignored(self):
        grid = GRID._replace(block_filtering=True, block_factor=1,
                             block_size=8, height_threshold=0.5)
        pts = np.array([
            [0.5, 0.5, 0.1, 0],    # ground (valid) -> filtered by height
            [1.5, 1.5, 2.0, 0],    # kept
            [2.5, 2.5, -5.0, 0],   # INVALID: must not poison the block min
        ], np.float32)
        valid = jnp.array([True, True, False])
        out = voxelize(jnp.array(pts), valid, grid, max_voxels=4,
                       max_points_per_voxel=2)
        assert int(np.asarray(out["voxel_valid"]).sum()) == 1
        coords = np.asarray(out["coords"])[np.asarray(out["voxel_valid"])]
        assert coords[0].tolist() == [1, 1, 1]

    def test_off_by_default(self):
        pts = np.array([[0.5, 0.5, 0.1, 0]], np.float32)
        out = voxelize(jnp.array(pts), jnp.ones(1, bool), GRID, max_voxels=2,
                       max_points_per_voxel=2)
        assert int(np.asarray(out["voxel_valid"]).sum()) == 1
