"""Training-driver integration tests: train_bev and train_second run a few
steps end-to-end on synthetic data (checkpoints, logs, config snapshots)."""


import json

import numpy as np
import pytest

from lyft3d_tpu.config import (
    AnchorConfig,
    BEVExperiment,
    OptimizerConfig,
    SecondExperiment,
    load_yaml,
)
from lyft3d_tpu.data.bev_dataset import generate_bev_dataset
from lyft3d_tpu.data.bev_pipeline import BEVConfig
from lyft3d_tpu.data.lyftdb import LyftDB
from lyft3d_tpu.data.synthetic import make_synthetic_lyft


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    root = make_synthetic_lyft(
        tmp_path_factory.mktemp("drv") / "lyft", num_scenes=1, samples_per_scene=4,
        classes=["car", "truck"], seed=2,
    )
    return LyftDB(root, root / "data")


class TestBEVTrainDriver:
    def test_few_steps(self, db, tmp_path):
        import jax.numpy as jnp

        bev_dir = tmp_path / "bev"
        cfg_small = BEVConfig(shape=(64, 64, 3), voxel_size=(1.0, 1.0, 1.5))
        generate_bev_dataset(db, bev_dir, cfg_small)

        exp = BEVExperiment(
            model="unet_reference",
            model_kwargs={"wf": 3, "depth": 1},
            bev_shape=(64, 64, 3),
            batch_size=2,
            optimizer=OptimizerConfig(name="adam", lr=1e-3, grad_accum=1,
                                      total_steps=4),
            model_dir=str(tmp_path / "run"),
        )
        from lyft3d_tpu.pipelines.bev_train import train_bev

        state, model = train_bev(exp, bev_dir, log_every=2, eval_every=0,
                                 dtype=jnp.float32)
        assert int(state.step) == 4
        assert (tmp_path / "run" / "experiment.yaml").exists()
        assert (tmp_path / "run" / "log.json.lst").exists()
        ckpts = list((tmp_path / "run").glob("model-*.ckpt"))
        assert ckpts

    def test_batchnorm_training(self, db, tmp_path):
        """train_bev with norm_type=batch: stats live in state.params,
        refresh each step (the _model_state convention) and the masked
        optimizer never decays them."""
        import jax
        import jax.numpy as jnp

        bev_dir = tmp_path / "bev_bn"
        cfg_small = BEVConfig(shape=(64, 64, 3), voxel_size=(1.0, 1.0, 1.5))
        generate_bev_dataset(db, bev_dir, cfg_small)

        exp = BEVExperiment(
            model="unet_reference",
            model_kwargs={"wf": 3, "depth": 1, "norm_type": "batch"},
            bev_shape=(64, 64, 3),
            batch_size=2,
            optimizer=OptimizerConfig(name="adam", lr=1e-3, grad_accum=1,
                                      total_steps=3),
            model_dir=str(tmp_path / "run_bn"),
        )
        from lyft3d_tpu.pipelines.bev_train import train_bev

        state, model = train_bev(exp, bev_dir, log_every=2, eval_every=0,
                                 dtype=jnp.float32)
        assert int(state.step) == 3
        assert "batch_stats" in state.params
        # the running stats moved away from init (mean starts at 0)
        means = [
            np.asarray(l)
            for path, l in jax.tree_util.tree_flatten_with_path(
                state.params["batch_stats"]
            )[0]
            if "mean" in jax.tree_util.keystr(path)
        ]
        assert any(np.abs(m).max() > 0 for m in means)

    def test_config_presets_load(self):
        bev = load_yaml(BEVExperiment, "configs/bev_seresnext101_map.yaml")
        assert bev.model == "unet_seresnext101"
        sec = load_yaml(SecondExperiment, "configs/second_lyft_9class.yaml")
        assert len(sec.anchors) == 9
        assert sec.db_sampler_quota["animal"] == 4

    def test_sparse_config_builds_reference_anchor_grid(self):
        from lyft3d_tpu.pipelines.second_train import (
            voxelnet_config_from_experiment,
        )

        sec = load_yaml(
            SecondExperiment, "configs/second_lyft_9class_sparse.yaml"
        )
        # The shipped config runs the z-slab UNIT sparse middle (the
        # occupancy-proportional formulation of the same SpMiddleFHD
        # stack, production since round 3); "sparse" (per-voxel gather,
        # the oracle) and "sparse_columns" (dense-z) remain valid options.
        assert sec.middle in ("sparse", "sparse_columns", "sparse_units")
        assert sec.encoder == "simple"
        vcfg = voxelnet_config_from_experiment(sec)
        # TRUE FHD geometry (all.fhd.config:4-13): 0.05 m voxels over
        # ±49.6 m / z [-5, 3], 1 pt/voxel, height-based block filtering.
        assert vcfg.grid.grid_size == (1984, 1984, 40)
        assert vcfg.grid.block_filtering and vcfg.grid.height_threshold == 0.2
        assert vcfg.max_voxels == 60000 and vcfg.max_points_per_voxel == 1
        assert vcfg.middle_max_voxels == (32768, 16384, 8192)
        # ds 8 sparse stack (248² BEV) + stride-2 RPN stem + up-concat →
        # the reference all.fhd's ~124² anchor grid (~276k anchors ≈ the
        # "~300k" its rpn comment cites, over 9 classes × 2 rotations).
        assert vcfg.feature_hw == (124, 124)
        anchors, _, _, _ = vcfg.make_anchors()
        assert anchors.shape[0] == 124 * 124 * 18


class TestSecondTrainDriver:
    def test_few_steps(self, db, tmp_path):
        import jax.numpy as jnp

        from lyft3d_tpu.pipelines.second_pipeline import (
            LoaderConfig,
            SecondSampleLoader,
            create_infos,
        )
        from lyft3d_tpu.pipelines.second_train import (
            train_second,
            voxelnet_config_from_experiment,
        )

        infos = create_infos(db, num_sweeps=1, classes=["car", "truck"])
        exp = SecondExperiment(
            point_cloud_range=(-40, -40, -3, 40, 40, 5),
            voxel_size=(1.0, 1.0, 8.0),
            max_voxels=1024,
            max_points_per_voxel=4,
            anchors=(
                AnchorConfig(class_name="car", size=(2.0, 4.8, 1.7), z_center=0.8,
                             matched_threshold=0.45, unmatched_threshold=0.3),
                AnchorConfig(class_name="truck", size=(2.8, 10.0, 3.4), z_center=1.7,
                             matched_threshold=0.45, unmatched_threshold=0.3),
            ),
            batch_size=2,
            num_sweeps=1,
            optimizer=OptimizerConfig(name="adam", lr=1e-3, grad_accum=1,
                                      total_steps=3, clip_norm=10.0),
            model_dir=str(tmp_path / "second_run"),
        )
        loader = SecondSampleLoader(
            db, infos, ["car", "truck"],
            LoaderConfig(max_points=8192, num_sweeps=1, augment=True),
        )
        vcfg = voxelnet_config_from_experiment(
            exp, encoder_features=(16,), rpn_layer_nums=(1, 1), rpn_strides=(2, 2),
            rpn_filters=(16, 32), rpn_up_strides=(1, 2), rpn_up_filters=(16, 16),
        )
        tokens = [i["token"] for i in infos]
        state, model, vcfg = train_second(
            exp, loader, tokens, vcfg=vcfg, log_every=1, dtype=jnp.float32
        )
        assert int(state.step) == 3
        assert (tmp_path / "second_run" / "experiment.yaml").exists()

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject)
