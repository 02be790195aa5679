"""SECOND pipeline tests on the synthetic dataset: info creation, loader
arrays, the sensor→world eval conversion (oracle mAP = 1), and one train
step through voxelize→assign→model→loss."""


import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lyft3d_tpu.data.lyftdb import LyftDB
from lyft3d_tpu.data.synthetic import make_synthetic_lyft
from lyft3d_tpu.eval.map_eval import evaluate_map
from lyft3d_tpu.models.second.voxelnet import VoxelNet, VoxelNetConfig, voxelnet_loss
from lyft3d_tpu.ops.anchors import AnchorSpec, assign_targets
from lyft3d_tpu.ops.voxelize import VoxelGrid, voxelize
from lyft3d_tpu.pipelines.bev import gt_records
from lyft3d_tpu.pipelines.second_pipeline import (
    LoaderConfig,
    SecondSampleLoader,
    create_infos,
    detections_to_world_records,
    load_infos,
    save_infos,
)

CLASSES = ["car", "bus", "truck"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = make_synthetic_lyft(
        tmp_path_factory.mktemp("lyft_second"),
        num_scenes=1,
        samples_per_scene=3,
        boxes_per_sample=4,
        classes=CLASSES,
        seed=11,
    )
    db = LyftDB(root, root / "data")
    infos = create_infos(db, num_sweeps=2, classes=CLASSES)
    return db, infos


class TestInfos:
    def test_create_and_pickle_roundtrip(self, setup, tmp_path):
        db, infos = setup
        assert len(infos) == 3
        info = infos[0]
        assert info["gt_boxes"].shape[1] == 7
        assert len(info["gt_names"]) == len(info["gt_boxes"])
        save_infos(infos, tmp_path / "infos.pkl")
        back = load_infos(tmp_path / "infos.pkl")
        np.testing.assert_allclose(back[0]["gt_boxes"], info["gt_boxes"])

    def test_gt_boxes_contain_cluster_points(self, setup):
        db, infos = setup
        loader = SecondSampleLoader(
            db, infos, CLASSES, LoaderConfig(num_sweeps=1, augment=False)
        )
        info = infos[0]
        pts = loader.load_points(info)
        from lyft3d_tpu.core.geometry import points_in_boxes

        gt = info["gt_boxes"]
        member = points_in_boxes(pts[:, :3], gt[:, :3], gt[:, 3:6] * 1.02, gt[:, 6])
        # Each synthetic box has a dense cluster.
        assert (member.sum(axis=1) > 20).all()


class TestLoader:
    def test_fixed_shapes(self, setup):
        db, infos = setup
        cfg = LoaderConfig(max_points=4096, max_gt=8, num_sweeps=2)
        loader = SecondSampleLoader(db, infos, CLASSES, cfg)
        s = loader.sample(infos[1]["token"], train=True)
        assert s["points"].shape == (4096, 4)
        assert s["gt_boxes"].shape == (8, 7)
        assert s["gt_valid"].sum() == 4
        batch = loader.batch([i["token"] for i in infos], train=False)
        assert batch["points"].shape == (3, 4096, 4)

    def test_augmentation_changes_sample(self, setup):
        db, infos = setup
        cfg = LoaderConfig(max_points=4096, num_sweeps=1, augment=True)
        loader = SecondSampleLoader(db, infos, CLASSES, cfg, seed=1)
        a = loader.sample(infos[0]["token"], train=True)
        b_noaug = SecondSampleLoader(
            db, infos, CLASSES, LoaderConfig(max_points=4096, num_sweeps=1, augment=False)
        ).sample(infos[0]["token"], train=True)
        assert not np.allclose(a["gt_boxes"][a["gt_valid"]], b_noaug["gt_boxes"][b_noaug["gt_valid"]])


class TestWorldConversion:
    def test_oracle_gt_maps_to_world(self, setup):
        """Sensor-frame GT pushed through detections_to_world_records must
        reproduce the world-frame annotations (mAP = 1)."""
        db, infos = setup
        preds = []
        for info in infos:
            gt = info["gt_boxes"]
            classes = np.array(
                [CLASSES.index(n) + 1 for n in info["gt_names"]], np.int32
            )
            preds.extend(
                detections_to_world_records(
                    info, gt, np.ones(len(gt)) * 0.9, classes,
                    np.ones(len(gt), bool), CLASSES,
                )
            )
        gt_recs = gt_records(db, [i["token"] for i in infos], classes=CLASSES)
        overall, per_class = evaluate_map(gt_recs, preds)
        assert overall > 0.99, (overall, per_class)


class TestTrainStep:
    def test_voxelize_assign_forward_loss(self, setup):
        db, infos = setup
        grid = VoxelGrid(
            point_cloud_range=(-40, -40, -3, 40, 40, 5), voxel_size=(1.0, 1.0, 8.0)
        )
        specs = tuple(
            AnchorSpec(size=(2.0, 5.0, 1.8), z_center=0.5, matched_threshold=0.45,
                       unmatched_threshold=0.3, class_id=i + 1)
            for i in range(len(CLASSES))
        )
        cfg = VoxelNetConfig(
            grid=grid, max_voxels=2048, max_points_per_voxel=8,
            encoder="pillars", encoder_features=(32,), anchor_specs=specs,
            rpn_layer_nums=(1, 1), rpn_strides=(2, 2), rpn_filters=(32, 64),
            rpn_up_strides=(1, 2), rpn_up_filters=(32, 32),
        )
        loader = SecondSampleLoader(
            db, infos, CLASSES, LoaderConfig(max_points=8192, num_sweeps=1, augment=False)
        )
        batch = loader.batch([infos[0]["token"], infos[1]["token"]])

        anchors, mt, ut, acls = cfg.make_anchors()

        def train_loss(params, model, batch):
            vox = jax.vmap(
                lambda p, v: voxelize(p, v, grid, cfg.max_voxels, cfg.max_points_per_voxel)
            )(jnp.asarray(batch["points"]), jnp.asarray(batch["points_valid"]))
            tgts = jax.vmap(
                lambda g, c, v: assign_targets(anchors, acls, mt, ut, g, c, v)
            )(
                jnp.asarray(batch["gt_boxes"]),
                jnp.asarray(batch["gt_classes"]),
                jnp.asarray(batch["gt_valid"]),
            )
            preds = model.apply(
                params, vox["voxels"], vox["num_points"], vox["coords"], vox["voxel_valid"]
            )
            return voxelnet_loss(preds, tgts, cfg)

        model = VoxelNet(cfg, dtype=jnp.float32)
        vox0 = jax.vmap(
            lambda p, v: voxelize(p, v, grid, cfg.max_voxels, cfg.max_points_per_voxel)
        )(jnp.asarray(batch["points"]), jnp.asarray(batch["points_valid"]))
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), vox0["voxels"], vox0["num_points"],
            vox0["coords"], vox0["voxel_valid"],
        )
        (loss, metrics), grads = jax.jit(
            lambda p: jax.value_and_grad(
                lambda pp: train_loss(pp, model, batch), has_aux=True
            )(p)
        )(params)
        assert np.isfinite(float(loss))
        assert float(metrics["num_pos"]) >= 1


class TestAnchorMaskInLoss:
    def test_loss_with_anchor_area_threshold(self, setup):
        import dataclasses

        import jax
        import jax.numpy as jnp
        import optax

        from lyft3d_tpu.models.second.voxelnet import VoxelNet
        from lyft3d_tpu.pipelines.second_train import make_second_loss_fn

        db, infos = setup
        grid = VoxelGrid(
            point_cloud_range=(-40, -40, -3, 40, 40, 5), voxel_size=(1.0, 1.0, 8.0)
        )
        specs = tuple(
            AnchorSpec(size=(2.0, 5.0, 1.8), z_center=0.5, matched_threshold=0.45,
                       unmatched_threshold=0.3, class_id=i + 1)
            for i in range(len(CLASSES))
        )
        cfg = VoxelNetConfig(
            grid=grid, max_voxels=2048, max_points_per_voxel=8,
            encoder="pillars", encoder_features=(16,), anchor_specs=specs,
            rpn_layer_nums=(1, 1), rpn_strides=(2, 2), rpn_filters=(16, 32),
            rpn_up_strides=(1, 2), rpn_up_filters=(16, 16),
            anchor_area_threshold=1.0,
        )
        loader = SecondSampleLoader(
            db, infos, CLASSES, LoaderConfig(max_points=8192, num_sweeps=1, augment=False)
        )
        batch = {k: jnp.asarray(v) for k, v in loader.batch([infos[0]["token"]]).items()}
        model = VoxelNet(cfg, dtype=jnp.float32)
        vox = jax.vmap(
            lambda p, v: voxelize(p, v, grid, cfg.max_voxels, cfg.max_points_per_voxel)
        )(batch["points"], batch["points_valid"])
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), vox["voxels"], vox["num_points"],
            vox["coords"], vox["voxel_valid"],
        )
        loss_fn = make_second_loss_fn(cfg)
        (loss, metrics), grads = jax.jit(
            lambda p: jax.value_and_grad(
                lambda pp: loss_fn(model, pp, batch, None), has_aux=True
            )(p)
        )(params)
        assert np.isfinite(float(loss))
        assert float(metrics["num_pos"]) >= 1  # objects sit on occupied cells
        assert np.isfinite(float(optax.global_norm(grads)))

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject)
