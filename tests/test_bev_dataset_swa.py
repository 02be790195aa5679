"""Offline BEV dataset generation/loading, SWA, profiler, progress tests."""


import numpy as np
import jax.numpy as jnp
import pytest

from lyft3d_tpu.data.bev_dataset import (
    BEVImageDataset,
    batch_iterator,
    generate_bev_dataset,
    numpy_bev_raster,
)
from lyft3d_tpu.data.bev_pipeline import BEVConfig
from lyft3d_tpu.data.lyftdb import LyftDB
from lyft3d_tpu.data.synthetic import make_synthetic_lyft
from lyft3d_tpu.ops.bev_raster import bev_rasterize_scatter
from lyft3d_tpu.train.swa import average_params, moving_average
from lyft3d_tpu.utils.profiler import SectionTimers, simple_timer
from lyft3d_tpu.utils.progress import ProgressBar


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = make_synthetic_lyft(
        tmp_path_factory.mktemp("lyft_bevds"), num_scenes=1, samples_per_scene=2,
        classes=["car", "bus"], seed=5,
    )
    db = LyftDB(root, root / "data")
    cfg = BEVConfig(shape=(64, 64, 3), voxel_size=(1.0, 1.0, 1.5), max_points=16384)
    return db, cfg, tmp_path_factory.mktemp("bev_out")


class TestRasterParity:
    def test_numpy_matches_device_raster(self, setup):
        db, cfg, _ = setup
        rng = np.random.RandomState(0)
        pts = rng.uniform(-40, 40, (3000, 4)).astype(np.float32)
        a = numpy_bev_raster(pts, cfg)
        b = np.asarray(
            bev_rasterize_scatter(
                jnp.array(pts), jnp.ones(3000, bool), cfg.shape, cfg.voxel_size,
                cfg.z_offset,
            )
        )
        np.testing.assert_array_equal(a * 16, b)  # pre-normalized counts


class TestGeneration:
    def test_generate_and_load(self, setup):
        db, cfg, out = setup
        tokens = [s["token"] for s in db.sample]
        done = generate_bev_dataset(db, out, cfg, tokens)
        assert done == tokens
        for tok in tokens:
            assert (out / f"{tok}_input.png").exists()
            assert (out / f"{tok}_target.png").exists()
            assert (out / f"{tok}_map.png").exists()

        ds = BEVImageDataset(out, tokens, with_map=True)
        x, y = ds.load(0)
        assert x.shape == (64, 64, 6)
        assert y.shape == (64, 64)
        assert y.max() >= 1  # some class pixels drawn
        assert 0.0 <= x.min() and x.max() <= 1.0

    def test_idempotent_restart(self, setup):
        db, cfg, out = setup
        tokens = [s["token"] for s in db.sample]
        # Second run with overwrite=False touches nothing but succeeds.
        done = generate_bev_dataset(db, out, cfg, tokens, overwrite=False)
        assert done == tokens

    def test_augmentation_flip(self, setup):
        db, cfg, out = setup
        tokens = [s["token"] for s in db.sample]
        ds = BEVImageDataset(out, tokens, augment=True, seed=0)
        base = BEVImageDataset(out, tokens, augment=False)
        xs = [ds.load(0)[0] for _ in range(8)]
        x0 = base.load(0)[0]
        assert any(not np.allclose(x, x0) for x in xs)

    def test_batch_iterator_shapes(self, setup):
        db, cfg, out = setup
        tokens = [s["token"] for s in db.sample]
        ds = BEVImageDataset(out, tokens)
        batches = list(batch_iterator(ds, batch_size=3, steps=4))
        assert len(batches) == 4
        assert batches[0]["image"].shape == (3, 64, 64, 6)
        assert batches[0]["label"].shape == (3, 64, 64)


class TestSWA:
    def test_moving_average(self):
        a = {"w": jnp.zeros(3)}
        b = {"w": jnp.ones(3) * 3.0}
        avg = moving_average(a, b, n=2)  # avg of 3 things where first two were 0
        np.testing.assert_allclose(np.asarray(avg["w"]), 1.0)

    def test_average_params(self):
        ps = [{"w": jnp.full(2, float(v))} for v in (1, 2, 3, 6)]
        avg = average_params(ps)
        np.testing.assert_allclose(np.asarray(avg["w"]), 3.0)


class TestUtils:
    def test_section_timers(self):
        t = SectionTimers(enabled=True, sync=False)
        with t.section("a"):
            sum(range(1000))
        with t.section("a"):
            sum(range(1000))
        avg = t.averages_ms()
        assert "a" in avg and avg["a"] >= 0
        assert "a=" in t.report()
        t.clear()
        assert t.averages_ms() == {}

    def test_disabled_timers(self):
        t = SectionTimers(enabled=False)
        with t.section("x"):
            pass
        assert t.averages_ms() == {}

    def test_progress_bar(self, capsys):
        import io

        stream = io.StringIO()
        bar = ProgressBar(5, stream=stream)
        for _ in range(5):
            bar.update()
        assert "5/5" in stream.getvalue()

    def test_simple_timer(self, capsys):
        with simple_timer("op"):
            pass
        assert "op elapsed" in capsys.readouterr().out

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject)
