"""Prefetcher + measure-time SECOND eval tests."""

import time

import numpy as np
import pytest

from lyft3d_tpu.data.prefetch import ThreadedPrefetcher, prefetch


class TestPrefetch:
    def test_yields_all_items(self):
        items = list(range(20))
        out = list(prefetch(iter(items), depth=4))
        assert sorted(out) == items

    def test_overlaps_production(self):
        def slow_gen():
            for i in range(6):
                time.sleep(0.05)
                yield i

        t0 = time.time()
        consumed = []
        for x in ThreadedPrefetcher(slow_gen, depth=3):
            time.sleep(0.05)  # consumer work overlapping producer work
            consumed.append(x)
        elapsed = time.time() - t0
        assert sorted(consumed) == list(range(6))
        # Serial would be ≥ 0.6 s; overlapped should be well under.
        assert elapsed < 0.55, elapsed

    def test_propagates_errors(self):
        def bad_gen():
            yield 1
            raise ValueError("boom")

        with pytest.raises(ValueError, match="boom"):
            list(ThreadedPrefetcher(bad_gen, depth=2))


class TestMeasureTimeEval:
    def test_second_eval_measure_time(self, tmp_path, capsys):
        import jax
        import jax.numpy as jnp

        from lyft3d_tpu.data.lyftdb import LyftDB
        from lyft3d_tpu.data.synthetic import make_synthetic_lyft
        from lyft3d_tpu.models.second.voxelnet import VoxelNet, VoxelNetConfig
        from lyft3d_tpu.ops.anchors import AnchorSpec
        from lyft3d_tpu.ops.voxelize import VoxelGrid, voxelize
        from lyft3d_tpu.pipelines.second_pipeline import (
            LoaderConfig,
            SecondSampleLoader,
            create_infos,
        )
        from lyft3d_tpu.pipelines.second_train import evaluate_second

        root = make_synthetic_lyft(tmp_path / "lyft", num_scenes=1,
                                   samples_per_scene=2, classes=["car"], seed=3)
        db = LyftDB(root, root / "data")
        infos = create_infos(db, num_sweeps=1, classes=["car"])
        vcfg = VoxelNetConfig(
            grid=VoxelGrid(point_cloud_range=(-40, -40, -3, 40, 40, 5),
                           voxel_size=(1.0, 1.0, 8.0)),
            max_voxels=1024, max_points_per_voxel=4, encoder="pillars",
            encoder_features=(16,), rpn_layer_nums=(1, 1), rpn_strides=(2, 2),
            rpn_filters=(16, 32), rpn_up_strides=(1, 2), rpn_up_filters=(16, 16),
            anchor_specs=(AnchorSpec(size=(2.0, 4.8, 1.7), z_center=0.8,
                                     matched_threshold=0.45,
                                     unmatched_threshold=0.3),),
            nms_pre=64, nms_post=8,
        )
        loader = SecondSampleLoader(
            db, infos, ["car"], LoaderConfig(max_points=8192, num_sweeps=1, augment=False)
        )
        model = VoxelNet(vcfg, dtype=jnp.float32)
        s = loader.sample(infos[0]["token"], train=False)
        vox = voxelize(jnp.asarray(s["points"]), jnp.asarray(s["points_valid"]),
                       vcfg.grid, vcfg.max_voxels, vcfg.max_points_per_voxel)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), vox["voxels"][None], vox["num_points"][None],
            vox["coords"][None], vox["voxel_valid"][None],
        )
        records = evaluate_second(
            model, params, vcfg, loader, [i["token"] for i in infos], ["car"],
            measure_time=True,
        )
        out = capsys.readouterr().out
        assert "sec_per_example" in out
        assert isinstance(records, list)


class TestMappedPrefetcher:
    def test_ordered_output_matches_serial(self):
        from lyft3d_tpu.data.prefetch import MappedPrefetcher

        out = list(MappedPrefetcher(lambda: range(50), lambda i: i * i,
                                    num_workers=4, depth=4))
        assert out == [i * i for i in range(50)]

    def test_parallel_speedup_over_lockstepped_map(self):
        import time

        from lyft3d_tpu.data.prefetch import MappedPrefetcher

        def slow_map(i):
            time.sleep(0.02)
            return i

        t0 = time.perf_counter()
        out = list(MappedPrefetcher(lambda: range(40), slow_map,
                                    num_workers=8, depth=8))
        dt = time.perf_counter() - t0
        assert out == list(range(40))
        # serial would be >= 0.8s; 8 workers should land well under half.
        assert dt < 0.45, f"no parallel speedup: {dt:.2f}s"

    def test_map_error_propagates(self):
        import pytest

        from lyft3d_tpu.data.prefetch import MappedPrefetcher

        def bad(i):
            if i == 5:
                raise ValueError("boom")
            return i

        with pytest.raises(ValueError, match="boom"):
            list(MappedPrefetcher(lambda: range(100000000), bad,
                                  num_workers=3, depth=4))

    def test_unordered_mode_yields_everything(self):
        from lyft3d_tpu.data.prefetch import MappedPrefetcher

        out = list(MappedPrefetcher(lambda: range(30), lambda i: i,
                                    num_workers=4, depth=4, ordered=False))
        assert sorted(out) == list(range(30))
