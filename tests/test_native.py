"""Native C++ runtime tests: build, lidar decode, transforms, threaded batch
load, BEV raster — all cross-checked against the numpy/JAX implementations."""

import numpy as np
import pytest

from lyft3d_tpu.core.geometry import transform_matrix
from lyft3d_tpu.core.quaternion import quat_from_yaw
from lyft3d_tpu.native import (
    bev_raster,
    load_batch,
    native_available,
    read_lidar,
    transform_points,
)


@pytest.fixture(scope="module")
def sweep_file(tmp_path_factory):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-50, 50, (5000, 5)).astype(np.float32)
    path = tmp_path_factory.mktemp("bins") / "sweep.bin"
    pts.tofile(path)
    return path, pts


class TestNative:
    def test_builds(self):
        assert native_available(), "g++ build of libl3dnative.so failed"

    def test_read_lidar(self, sweep_file):
        path, pts = sweep_file
        got = read_lidar(path)
        assert got.shape == (5000, 4)
        np.testing.assert_allclose(got, pts[:, :4])

    def test_read_lidar_cap(self, sweep_file):
        path, _ = sweep_file
        got = read_lidar(path, max_points=100)
        assert got.shape == (100, 4)

    def test_transform_matches_numpy(self, sweep_file):
        _, pts = sweep_file
        tm = transform_matrix([1, 2, 3], quat_from_yaw(0.7))
        a = transform_points(pts[:, :4].copy(), tm)
        b = pts[:, :3] @ tm[:3, :3].T.astype(np.float32) + tm[:3, 3].astype(np.float32)
        np.testing.assert_allclose(a[:, :3], b, atol=1e-4)
        np.testing.assert_allclose(a[:, 3], pts[:, 3])  # intensity untouched

    def test_load_batch_threaded(self, sweep_file, tmp_path):
        path, pts = sweep_file
        rng = np.random.RandomState(1)
        paths, tms = [], []
        for i in range(4):
            p = tmp_path / f"s{i}.bin"
            data = rng.uniform(-10, 10, (100 + 50 * i, 5)).astype(np.float32)
            data.tofile(p)
            paths.append(p)
            tms.append(transform_matrix([i, 0, 0], quat_from_yaw(0.1 * i)))
        out, counts = load_batch(paths, np.stack(tms), max_points=512, n_threads=3)
        assert out.shape == (4, 512, 4)
        assert counts.tolist() == [100, 150, 200, 250]
        # Padding zeroed.
        assert np.all(out[0, 100:] == 0)
        # Spot-check transform of file 2.
        raw = np.fromfile(paths[2], np.float32).reshape(-1, 5)
        want = raw[:, :3] @ tms[2][:3, :3].T.astype(np.float32) + tms[2][:3, 3].astype(
            np.float32
        )
        np.testing.assert_allclose(out[2, :200, :3], want, atol=1e-4)

    def test_bev_raster_matches_numpy(self, sweep_file):
        _, pts = sweep_file
        from lyft3d_tpu.data.bev_dataset import numpy_bev_raster
        from lyft3d_tpu.data.bev_pipeline import BEVConfig

        cfg = BEVConfig(shape=(64, 64, 3), voxel_size=(1.5, 1.5, 1.5), z_offset=-2.0)
        want = numpy_bev_raster(pts[:, :4], cfg) * 16.0  # un-normalized counts
        got = bev_raster(pts[:, :4], cfg.shape, cfg.voxel_size, cfg.z_offset)
        np.testing.assert_array_equal(got, want)

    def test_missing_file_raises(self, tmp_path):
        if not native_available():
            pytest.skip("no native lib")
        with pytest.raises(FileNotFoundError):
            read_lidar(tmp_path / "nope.bin")
