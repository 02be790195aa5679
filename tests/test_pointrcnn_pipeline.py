"""PointRCNN pipeline tests: KITTI loader, round-robin RPN training, joint
eval producing KITTI labels + AP frames — on an exported synthetic dataset."""


import numpy as np
import jax.numpy as jnp
import pytest

from lyft3d_tpu.data.kitti import export_kitti, read_label_file
from lyft3d_tpu.data.lyftdb import LyftDB
from lyft3d_tpu.data.synthetic import make_synthetic_lyft
from lyft3d_tpu.eval.kitti_eval import kitti_ap, recall_at
from lyft3d_tpu.models.pointrcnn.net import PointRCNN, PointRCNNConfig
from lyft3d_tpu.pipelines.pointrcnn_train import (
    KittiLoaderConfig,
    KittiPointRCNNLoader,
    eval_pointrcnn,
    train_pointrcnn_rpn,
)

TINY = PointRCNNConfig(
    sa_npoints=(128, 32),
    sa_radii=((1.5,), (3.0,)),
    sa_nsamples=((8,), (8,)),
    sa_widths=(16, 32),
    fp_width=16,
    num_proposals=8,
    nms_pre=64,
    roi_points=16,
    rcnn_sa_npoints=(8,),
    rcnn_widths=(16,),
    rois_per_image=8,
)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = make_synthetic_lyft(
        tmp_path_factory.mktemp("prcnn") / "lyft", num_scenes=1,
        samples_per_scene=3, boxes_per_sample=4, classes=["car"], seed=9,
        points_per_sweep=4096,
    )
    db = LyftDB(root, root / "data")
    return export_kitti(db, tmp_path_factory.mktemp("prcnn") / "kitti")


class TestLoader:
    def test_fixed_shapes(self, kitti_root):
        loader = KittiPointRCNNLoader(
            kitti_root, KittiLoaderConfig(num_points=2048, classes=("car",))
        )
        assert len(loader.stems) == 3
        s = loader.sample(loader.stems[0])
        assert s["points"].shape == (2048, 3)
        assert s["gt_boxes"].shape == (32, 7)
        assert s["gt_valid"].sum() == 4

    def test_subsample_near_far(self, kitti_root):
        loader = KittiPointRCNNLoader(
            kitti_root, KittiLoaderConfig(num_points=64, near_radius=10.0)
        )
        rng = np.random.RandomState(0)
        near = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
        far = rng.uniform(20, 40, (30, 3)).astype(np.float32)
        pts, n = loader.subsample(np.concatenate([near, far]))
        assert n == 64
        dist = np.linalg.norm(pts[:, :2], axis=1)
        assert (dist >= 10).sum() == 30  # all far points kept

    def test_batch(self, kitti_root):
        loader = KittiPointRCNNLoader(
            kitti_root, KittiLoaderConfig(num_points=1024)
        )
        b = loader.batch(loader.stems[:2])
        assert b["points"].shape == (2, 1024, 3)


class TestTrainEval:
    def test_rpn_round_robin_trains(self, kitti_root):
        loader = KittiPointRCNNLoader(
            kitti_root, KittiLoaderConfig(num_points=1024)
        )
        model, params, losses = train_pointrcnn_rpn(
            loader, TINY, steps=8, batch_size=1, num_parts=2
        )
        assert len(losses) == 8
        assert all(np.isfinite(l) for l in losses)

    def test_joint_eval_labels_and_ap(self, kitti_root, tmp_path):
        import jax

        loader = KittiPointRCNNLoader(
            kitti_root, KittiLoaderConfig(num_points=1024)
        )
        model = PointRCNN(TINY)
        s = loader.sample(loader.stems[0])
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.asarray(s["points"]), None,
            jnp.asarray(s["points_valid"]),
        )
        gt_frames, det_frames, stats = eval_pointrcnn(
            model, params, loader, TINY, out_dir=tmp_path / "labels"
        )
        assert len(gt_frames) == 3
        assert "recall@0.5" in stats and stats["num_frames"] == 3
        assert all(0.0 <= stats[f"recall@{t}"] <= 1.0 for t in (0.1, 0.3, 0.5, 0.7))
        # Untrained net → AP near 0, but the machinery must run end to end.
        ap = kitti_ap(gt_frames, det_frames, "car", 0.5, "bev")
        assert 0.0 <= ap <= 1.0
        rec = recall_at(gt_frames, det_frames, "car", 0.3)
        assert 0.0 <= rec <= 1.0
        label_files = list((tmp_path / "labels").glob("*.txt"))
        assert len(label_files) == 3


class TestGTAug:
    def test_db_sampler_pastes_objects(self, kitti_root, tmp_path):
        import numpy as np

        from lyft3d_tpu.data.augment import DataBaseSampler, create_gt_database

        base = KittiPointRCNNLoader(kitti_root, KittiLoaderConfig(num_points=2048))
        # Build a gt database from the loader's own frames.
        samples = []
        for stem in base.stems:
            s = base.sample(stem)
            samples.append(
                {
                    "points": np.concatenate(
                        [s["points"], np.zeros((len(s["points"]), 1), np.float32)], -1
                    ),
                    "gt_boxes": s["gt_boxes"][s["gt_valid"]],
                    "gt_names": np.array(["car"] * int(s["gt_valid"].sum())),
                }
            )
        db = create_gt_database(tmp_path / "gtdb", samples, min_points=3)
        sampler = DataBaseSampler(db, {"car": 12}, seed=0)
        aug = KittiPointRCNNLoader(
            kitti_root, KittiLoaderConfig(num_points=2048), db_sampler=sampler
        )
        s_aug = aug.sample(aug.stems[0])
        s_plain = base.sample(base.stems[0])
        assert s_aug["gt_valid"].sum() > s_plain["gt_valid"].sum()


class TestRCNNOffline:
    def test_cache_and_offline_training(self, kitti_root):
        import jax
        import jax.numpy as jnp

        from lyft3d_tpu.models.pointrcnn.net import PointRCNN_RPN
        from lyft3d_tpu.pipelines.pointrcnn_train import (
            cache_rcnn_samples,
            train_rcnn_offline,
        )

        loader = KittiPointRCNNLoader(kitti_root, KittiLoaderConfig(num_points=1024))
        rpn = PointRCNN_RPN(TINY)
        s = loader.sample(loader.stems[0])
        rpn_params = jax.jit(rpn.init)(
            jax.random.PRNGKey(0), jnp.asarray(s["points"]),
            jnp.zeros((s["points"].shape[0], 1)), jnp.asarray(s["points_valid"]),
        )
        cache = cache_rcnn_samples(rpn, rpn_params, loader, TINY)
        assert len(cache) == 3
        assert cache[0]["rois"].shape == (TINY.num_proposals, 7)
        assert cache[0]["point_features"].shape[1] == TINY.fp_width

        model, params, losses = train_rcnn_offline(cache, TINY, steps=6)
        assert len(losses) == 6
        assert all(np.isfinite(l) for l in losses)


class TestAugScenes:
    def test_generate_aug_scenes(self, kitti_root, tmp_path):
        import numpy as np

        from lyft3d_tpu.data.aug_scene import generate_aug_scenes
        from lyft3d_tpu.data.augment import DataBaseSampler, create_gt_database
        from lyft3d_tpu.data.kitti import read_label_file

        base = KittiPointRCNNLoader(kitti_root, KittiLoaderConfig(num_points=2048))
        samples = []
        for stem in base.stems:
            s = base.sample(stem)
            samples.append(
                {
                    "points": np.concatenate(
                        [s["points"], np.zeros((len(s["points"]), 1), np.float32)], -1
                    ),
                    "gt_boxes": s["gt_boxes"][s["gt_valid"]],
                    "gt_names": np.array(["car"] * int(s["gt_valid"].sum())),
                }
            )
        db = create_gt_database(tmp_path / "gtdb2", samples, min_points=3)
        sampler = DataBaseSampler(db, {"car": 10}, seed=1)
        out = generate_aug_scenes(kitti_root, tmp_path / "aug", sampler, copies=2)

        bins = sorted((out / "velodyne").glob("*.bin"))
        assert len(bins) == 2 * len(base.stems)
        orig_labels = read_label_file(kitti_root / "label_2" / "000000.txt")
        aug_labels = read_label_file(out / "label_2" / "000000_0.txt")
        assert len(aug_labels) >= len(orig_labels)
        # Augmented tree loads through the standard loader.
        aug_loader = KittiPointRCNNLoader(out, KittiLoaderConfig(num_points=1024))
        s = aug_loader.sample(aug_loader.stems[0])
        assert s["gt_valid"].sum() >= 4


class TestSceneAug:
    def test_aug_changes_points_and_boxes(self, kitti_root):
        base = KittiPointRCNNLoader(
            kitti_root, KittiLoaderConfig(num_points=1024), seed=3
        )
        aug = KittiPointRCNNLoader(
            kitti_root,
            KittiLoaderConfig(num_points=1024, augment=True, aug_rot_range=0.5),
            seed=3,
        )
        s0 = base.sample(base.stems[0])
        s1 = aug.sample(aug.stems[0])
        # same subsample seed: differences come from the scene augmentation
        assert not np.allclose(s0["points"], s1["points"])
        assert not np.allclose(
            s0["gt_boxes"][s0["gt_valid"]], s1["gt_boxes"][s1["gt_valid"]]
        )
        # valid/gt counts unchanged by aug
        assert s0["gt_valid"].sum() == s1["gt_valid"].sum()


class TestRCNNOnline:
    def test_online_mode_and_refined_eval(self, kitti_root, tmp_path):
        """Online rcnn train mode (frozen RPN, live proposals) + joint eval
        emitting REFINED boxes that differ from the raw proposals
        (VERDICT r1 #3/#4)."""
        import jax

        from lyft3d_tpu.models.pointrcnn.net import PointRCNN_RPN
        from lyft3d_tpu.pipelines.pointrcnn_train import (
            assemble_joint_params,
            train_rcnn_online,
        )

        loader = KittiPointRCNNLoader(kitti_root, KittiLoaderConfig(num_points=1024))
        rpn = PointRCNN_RPN(TINY)
        s = loader.sample(loader.stems[0])
        rpn_params = jax.jit(rpn.init)(
            jax.random.PRNGKey(0), jnp.asarray(s["points"]),
            jnp.zeros((s["points"].shape[0], 1)), jnp.asarray(s["points_valid"]),
        )
        rcnn, rcnn_params, losses = train_rcnn_online(
            rpn, rpn_params, loader, TINY, steps=4
        )
        assert len(losses) == 4 and all(np.isfinite(l) for l in losses)

        joint = PointRCNN(TINY)
        joint_params = assemble_joint_params(
            joint, rpn_params, rcnn_params,
            (jnp.asarray(s["points"]), jnp.asarray(s["points_valid"])),
        )
        out = jax.device_get(
            jax.jit(lambda x, v: joint.apply(joint_params, x, None, v))(
                jnp.asarray(s["points"]), jnp.asarray(s["points_valid"])
            )
        )
        # the refined boxes are decoded from the RCNN regression, not the rois
        assert out["refined"].shape == out["proposals"]["rois"].shape
        assert not np.allclose(out["refined"], out["proposals"]["rois"])

        gt_frames, det_frames, stats = eval_pointrcnn(
            joint, joint_params, loader, TINY
        )
        # eval output boxes are the refined set, not proposals.rois
        assert not np.allclose(
            det_frames[0]["boxes"], out["proposals"]["rois"], atol=1e-3
        )


class TestPerClassMeanSize:
    def test_bin_coder_uses_class_table(self):
        from lyft3d_tpu.ops.bin_coder import (
            BinCoderConfig,
            decode_bin_boxes,
            encode_bin_targets,
        )

        cfg = BinCoderConfig(
            class_mean_sizes=((1.0, 2.0, 1.0), (3.0, 10.0, 3.0))
        )
        anchors = jnp.zeros((2, 3))
        gt = jnp.asarray(
            [[0.2, 0.1, 0.0, 1.1, 2.2, 1.05, 0.3],
             [0.2, 0.1, 0.0, 3.3, 11.0, 3.15, 0.3]]
        )
        cls_ids = jnp.asarray([0, 1])
        t = encode_bin_targets(anchors, gt, cfg, class_ids=cls_ids)
        # residuals are relative to the per-class mean
        np.testing.assert_allclose(
            np.asarray(t["size_res"][0]), [0.1, 0.1, 0.05], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(t["size_res"][1]), [0.1, 0.1, 0.05], atol=1e-6
        )

    def test_refined_decode_roundtrip(self):
        """Perfect logits/residuals for a canonical-frame target must decode
        to the original lidar-frame box through decode_refined_boxes."""
        from lyft3d_tpu.ops.bin_coder import (
            BinCoderConfig,
            decode_refined_boxes,
            encode_bin_targets,
        )

        cfg = BinCoderConfig(loc_scope=1.5, loc_bin_size=0.5, num_head_bin=9)
        roi = jnp.asarray([[5.0, -2.0, 1.0, 2.0, 4.5, 1.8, 0.7]])
        gt = jnp.asarray([[5.4, -1.7, 1.2, 1.9, 4.7, 1.7, 0.9]])
        # canonical-frame gt relative to roi
        rel = gt[:, :3] - roi[:, :3]
        c, s = jnp.cos(-roi[:, 6]), jnp.sin(-roi[:, 6])
        canon_gt = jnp.concatenate(
            [
                jnp.stack(
                    [c * rel[:, 0] - s * rel[:, 1],
                     s * rel[:, 0] + c * rel[:, 1],
                     rel[:, 2]], -1
                ),
                gt[:, 3:6],
                (gt[:, 6] - roi[:, 6])[:, None],
            ],
            axis=-1,
        )
        t = encode_bin_targets(jnp.zeros((1, 3)), canon_gt, cfg)
        sl = cfg.slices()
        # build ideal logits: one-hot bins (large margin), exact residuals
        x = np.zeros(cfg.channels, np.float32)
        x[sl["x_bin"]][int(t["x_bin"][0])] = 10.0
        x[sl["y_bin"]][int(t["y_bin"][0])] = 10.0
        x[sl["x_res"]][int(t["x_bin"][0])] = float(t["x_res"][0])
        x[sl["y_res"]][int(t["y_bin"][0])] = float(t["y_res"][0])
        x[sl["head_bin"]][int(t["head_bin"][0])] = 10.0
        x[sl["head_res"]][int(t["head_bin"][0])] = float(t["head_res"][0])
        x[sl["z_res"]] = float(t["z_res"][0])
        x[sl["size_res"]] = np.asarray(t["size_res"][0])
        refined = decode_refined_boxes(roi, jnp.asarray(x)[None, :], cfg)
        got = np.asarray(refined[0])
        want = np.asarray(gt[0])
        np.testing.assert_allclose(got[:6], want[:6], atol=1e-5)
        # yaw modulo 2pi
        dy = (got[6] - want[6] + np.pi) % (2 * np.pi) - np.pi
        assert abs(dy) < 1e-5

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject)
