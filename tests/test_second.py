"""SECOND/voxelnet stack tests: anchors, target assignment, model, loss,
predict round-trip, and a tiny overfit run."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lyft3d_tpu.models.second.voxel_encoder import (
    PillarFeatureNet,
    SimpleVoxel,
    VoxelFeatureExtractor,
    pillar_scatter,
    voxel_mean,
)
from lyft3d_tpu.models.second.voxelnet import (
    VoxelNet,
    VoxelNetConfig,
    voxelnet_loss,
    voxelnet_predict,
)
from lyft3d_tpu.ops.anchors import (
    AnchorSpec,
    anchors_area_mask,
    assign_targets,
    bev_occupancy_mask,
    generate_anchors,
)
from lyft3d_tpu.ops.box_ops import encode_boxes
from lyft3d_tpu.ops.voxelize import VoxelGrid, voxelize

GRID = VoxelGrid(point_cloud_range=(-16, -16, -3, 16, 16, 5), voxel_size=(1.0, 1.0, 8.0))
SPEC = AnchorSpec(size=(2.0, 4.0, 1.6), z_center=0.0, matched_threshold=0.5,
                  unmatched_threshold=0.35, class_id=1)
CFG = VoxelNetConfig(
    grid=GRID,
    max_voxels=256,
    max_points_per_voxel=8,
    encoder="pillars",
    encoder_features=(32,),
    anchor_specs=(SPEC,),
    rpn_layer_nums=(1, 1),
    rpn_strides=(2, 2),
    rpn_filters=(32, 64),
    rpn_up_strides=(1, 2),
    rpn_up_filters=(32, 32),
    nms_pre=128,
    nms_post=16,
)


def make_cloud(boxes, n_bg=256, pts_per_box=64, seed=0):
    """Synthetic cloud: clutter + clusters inside each (x,y,z,w,l,h,yaw) box."""
    rng = np.random.RandomState(seed)
    pts = [np.column_stack([
        rng.uniform(-15, 15, n_bg), rng.uniform(-15, 15, n_bg),
        rng.uniform(-2, 0, n_bg), rng.uniform(0, 1, n_bg)])]
    for x, y, z, w, l, h, yaw in boxes:
        local = rng.uniform(-0.5, 0.5, (pts_per_box, 3)) * [l, w, h]
        c, s = np.cos(yaw), np.sin(yaw)
        px = c * local[:, 0] - s * local[:, 1] + x
        py = s * local[:, 0] + c * local[:, 1] + y
        pts.append(np.column_stack([px, py, local[:, 2] + z, np.ones(pts_per_box)]))
    cloud = np.concatenate(pts).astype(np.float32)
    return cloud


class TestAnchors:
    def test_generate_layout(self):
        anchors, mt, ut, cls = generate_anchors((4, 4), GRID.point_cloud_range, [SPEC])
        assert anchors.shape == (4 * 4 * 2, 7)
        a = np.asarray(anchors).reshape(4, 4, 1, 2, 7)
        # Position-major: y slowest; rotations innermost.
        np.testing.assert_allclose(a[0, 0, 0, 0, 6], 0.0)
        np.testing.assert_allclose(a[0, 0, 0, 1, 6], np.pi / 2, rtol=1e-6)
        # Centers span the range.
        np.testing.assert_allclose(a[0, 0, 0, 0, :2], [-12.0, -12.0])
        np.testing.assert_allclose(a[3, 3, 0, 0, :2], [12.0, 12.0])
        np.testing.assert_array_equal(np.asarray(cls), 1)

    def test_two_spec_layout(self):
        spec2 = SPEC._replace(size=(1.0, 1.0, 2.0), class_id=2)
        anchors, _, _, cls = generate_anchors((2, 2), GRID.point_cloud_range, [SPEC, spec2])
        assert anchors.shape == (2 * 2 * 2 * 2, 7)
        c = np.asarray(cls).reshape(2, 2, 2, 2)
        assert (c[:, :, 0] == 1).all() and (c[:, :, 1] == 2).all()

    def test_occupancy_and_area_mask(self):
        coords = jnp.array([[2, 3, 0], [10, 11, 0]], jnp.int32)
        occ = bev_occupancy_mask(coords, jnp.array([True, True]), (16, 16))
        assert float(occ[3, 2]) == 1.0 and float(occ[11, 10]) == 1.0
        assert float(occ.sum()) == 2.0
        # 16x16 occupancy over a 32 m range → 2 m cells: cell (ix=2, iy=3)
        # spans world x∈[−12,−10], y∈[−10,−8].
        standup = jnp.array(
            [
                [-11.5, -9.5, -10.5, -8.5],  # covers occupied cell (2,3)
                [10.0, 10.0, 14.0, 14.0],  # empty region
            ]
        )
        mask = anchors_area_mask(standup, occ, GRID.point_cloud_range)
        assert bool(mask[0]) and not bool(mask[1])


class TestAssign:
    def test_exact_match(self):
        anchors, mt, ut, cls = generate_anchors((8, 8), GRID.point_cloud_range, [SPEC])
        # GT sitting exactly on the anchor at grid position (2, 3), rot 0.
        ga = np.asarray(anchors).reshape(8, 8, 2, 7)[2, 3, 0]
        gt = jnp.array([ga], jnp.float32)
        out = assign_targets(
            anchors, cls, mt, ut, gt, jnp.array([1], jnp.int32), jnp.array([True])
        )
        labels = np.asarray(out["labels"]).reshape(8, 8, 2)
        assert labels[2, 3, 0] == 1
        assert (labels >= 0).all()  # everything else background here
        idx = (2 * 8 + 3) * 2
        np.testing.assert_allclose(
            np.asarray(out["bbox_targets"])[idx], 0.0, atol=1e-6
        )
        assert np.asarray(out["reg_weights"]).sum() >= 1

    def test_force_match_low_iou(self):
        anchors, mt, ut, cls = generate_anchors((8, 8), GRID.point_cloud_range, [SPEC])
        # GT below every anchor's matched threshold still gets one anchor.
        gt = jnp.array([[0.5, 0.5, 0.0, 3.0, 3.0, 1.0, 0.2]], jnp.float32)
        out = assign_targets(
            anchors, cls, mt, ut, gt, jnp.array([1], jnp.int32), jnp.array([True])
        )
        assert int((np.asarray(out["labels"]) == 1).sum()) >= 1

    def test_invalid_gt_ignored(self):
        anchors, mt, ut, cls = generate_anchors((4, 4), GRID.point_cloud_range, [SPEC])
        gt = jnp.zeros((2, 7), jnp.float32)
        out = assign_targets(
            anchors, cls, mt, ut, gt, jnp.array([1, 1], jnp.int32),
            jnp.array([False, False]),
        )
        assert (np.asarray(out["labels"]) == 0).all()


class TestVoxelEncoders:
    def test_voxel_mean(self):
        v = jnp.array([[[1.0, 2], [3, 4], [0, 0]]])
        m = voxel_mean(v, jnp.array([2]))
        np.testing.assert_allclose(np.asarray(m), [[2.0, 3.0]])

    def test_encoders_shapes(self):
        rng = np.random.RandomState(0)
        voxels = jnp.array(rng.rand(16, 8, 4), jnp.float32)
        nump = jnp.array(rng.randint(1, 8, 16))
        coords = jnp.array(rng.randint(0, 8, (16, 3)), jnp.int32)
        for enc in (
            SimpleVoxel(num_features=4, dtype=jnp.float32),
            VoxelFeatureExtractor(features=(16, 32), dtype=jnp.float32),
            PillarFeatureNet(features=(24,), dtype=jnp.float32),
        ):
            params = enc.init(jax.random.PRNGKey(0), voxels, nump, coords)
            out = enc.apply(params, voxels, nump, coords)
            assert out.shape[0] == 16

    def test_pillar_scatter(self):
        feats = jnp.array([[1.0, 2.0], [3.0, 4.0]])
        coords = jnp.array([[1, 2, 0], [3, 0, 0]], jnp.int32)
        canvas = pillar_scatter(feats, coords, jnp.array([True, True]), (4, 4))
        np.testing.assert_allclose(np.asarray(canvas[2, 1]), [1.0, 2.0])
        np.testing.assert_allclose(np.asarray(canvas[0, 3]), [3.0, 4.0])
        assert float(jnp.abs(canvas).sum()) == 10.0


class TestVoxelNet:
    def _inputs(self, boxes, batch=1):
        cloud = make_cloud(boxes)
        vox = voxelize(
            jnp.array(cloud), jnp.ones(len(cloud), bool), GRID,
            max_voxels=CFG.max_voxels, max_points_per_voxel=CFG.max_points_per_voxel,
        )
        def rep(x):
            return jnp.broadcast_to(x[None], (batch,) + x.shape)
        return tuple(rep(vox[k]) for k in ("voxels", "num_points", "coords", "voxel_valid"))

    def test_forward_shapes(self):
        model = VoxelNet(CFG, dtype=jnp.float32)
        inputs = self._inputs([(2, 3, 0, 2, 4, 1.6, 0.3)])
        params = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
        preds = jax.jit(model.apply)(params, *inputs)
        anchors, *_ = CFG.make_anchors()
        assert preds["box"].shape == (1, anchors.shape[0], 7)
        assert preds["cls"].shape == (1, anchors.shape[0], 1)
        assert preds["dir"].shape == (1, anchors.shape[0], 2)

    def test_loss_and_grad(self):
        model = VoxelNet(CFG, dtype=jnp.float32)
        gt_box = (2.0, 3.0, 0.0, 2.0, 4.0, 1.6, 0.3)
        inputs = self._inputs([gt_box])
        params = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
        anchors, mt, ut, acls = CFG.make_anchors()
        tgt = assign_targets(
            anchors, acls, mt, ut,
            jnp.array([gt_box], jnp.float32), jnp.array([1], jnp.int32),
            jnp.array([True]),
        )
        tgt = jax.tree_util.tree_map(lambda x: x[None], tgt)

        def loss_fn(p):
            preds = model.apply(p, *inputs)
            return voxelnet_loss(preds, tgt, CFG)

        (loss, metrics), grads = jax.jit(
            lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
        )(params)
        assert np.isfinite(float(loss))
        assert float(metrics["num_pos"]) >= 1
        gn = float(optax.global_norm(grads))
        assert np.isfinite(gn) and gn > 0

    def test_predict_oracle_roundtrip(self):
        """Perfect predictions (encoded GT + huge logit) must survive decode
        + NMS and come back as the GT box."""
        anchors, mt, ut, acls = CFG.make_anchors()
        gt = jnp.array([[2.0, 3.0, 0.0, 2.0, 4.0, 1.6, 0.3]], jnp.float32)
        tgt = assign_targets(
            anchors, acls, mt, ut, gt, jnp.array([1], jnp.int32), jnp.array([True])
        )
        pos = tgt["labels"] == 1
        preds = {
            "box": tgt["bbox_targets"],
            "cls": jnp.where(pos[:, None], 12.0, -12.0),
            "dir": jnp.stack(
                [1.0 - tgt["dir_targets"] * 2.0, tgt["dir_targets"] * 2.0 - 1.0], -1
            ) * 10.0,
        }
        out = voxelnet_predict(preds, anchors, acls, CFG)
        valid = np.asarray(out["valid"])
        assert valid.sum() >= 1
        best = np.asarray(out["boxes"])[0]
        np.testing.assert_allclose(best[:6], np.asarray(gt[0, :6]), atol=1e-3)
        # Yaw equal modulo 2π.
        assert abs(np.angle(np.exp(1j * (best[6] - 0.3)))) < 1e-3
        assert int(np.asarray(out["classes"])[0]) == 1

    def test_overfit_single_scene(self):
        """A few adam steps on one scene must reduce the loss."""
        model = VoxelNet(CFG, dtype=jnp.float32)
        gt_box = (2.0, 3.0, 0.0, 2.0, 4.0, 1.6, 0.3)
        inputs = self._inputs([gt_box, (-5.0, -6.0, 0.0, 2.0, 4.0, 1.6, -0.7)])
        params = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
        anchors, mt, ut, acls = CFG.make_anchors()
        gt = jnp.array([gt_box, (-5.0, -6.0, 0.0, 2.0, 4.0, 1.6, -0.7)], jnp.float32)
        tgt = assign_targets(
            anchors, acls, mt, ut, gt, jnp.array([1, 1], jnp.int32),
            jnp.array([True, True]),
        )
        tgt = jax.tree_util.tree_map(lambda x: x[None], tgt)
        tx = optax.adam(2e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def lf(p):
                return voxelnet_loss(model.apply(p, *inputs), tgt, CFG)

            (l, m), g = jax.value_and_grad(lf, has_aux=True)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, l

        losses = []
        for _ in range(30):
            params, opt, l = step(params, opt)
            losses.append(float(l))
        assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])


class TestPerClassNMS:
    def test_cross_class_overlap_survives(self):
        """Two overlapping boxes of different classes both survive per-class
        NMS but not single NMS."""
        import dataclasses

        spec2 = SPEC._replace(class_id=2)
        base = dataclasses.replace(CFG, anchor_specs=(SPEC, spec2), nms_post=8)
        anchors, mt, ut, acls = base.make_anchors()
        gt1 = jnp.array([[2.0, 3.0, 0.0, 2.0, 4.0, 1.6, 0.0]], jnp.float32)
        # Perfect predictions for the same location under each class's anchor.
        tgt1 = assign_targets(anchors, acls, mt, ut, gt1, jnp.array([1], jnp.int32),
                              jnp.array([True]))
        tgt2 = assign_targets(anchors, acls, mt, ut, gt1, jnp.array([2], jnp.int32),
                              jnp.array([True]))
        pos = (tgt1["labels"] == 1) | (tgt2["labels"] == 2)
        preds = {
            "box": tgt1["bbox_targets"] + tgt2["bbox_targets"],
            "cls": jnp.where(pos[:, None], 10.0, -10.0),
            "dir": jnp.zeros((anchors.shape[0], 2)),
        }
        from lyft3d_tpu.models.second.voxelnet import voxelnet_predict

        single = voxelnet_predict(preds, anchors, acls, base)
        per_class = voxelnet_predict(
            preds, anchors, acls, dataclasses.replace(base, per_class_nms=True)
        )
        n_single = int(np.asarray(single["valid"]).sum())
        n_per_class = int(np.asarray(per_class["valid"]).sum())
        assert n_per_class >= 2
        assert n_single < n_per_class
        classes = set(np.asarray(per_class["classes"])[np.asarray(per_class["valid"])].tolist())
        assert {1, 2} <= classes


class TestSparseMiddleVoxelNet:
    def test_fhd_style_forward_and_grad(self):
        """VoxelNet with the sparse middle extractor (SpMiddleFHD path):
        3D voxel grid → submanifold/strided sparse convs → dense BEV → RPN."""
        import dataclasses

        grid3d = VoxelGrid(
            point_cloud_range=(-16, -16, -4, 16, 16, 4), voxel_size=(1.0, 1.0, 1.0)
        )
        cfg = dataclasses.replace(
            CFG,
            grid=grid3d,
            max_voxels=512,
            max_points_per_voxel=4,
            encoder="simple",
            middle="sparse",
            middle_features=(8, 16),
            middle_max_voxels=(256, 128),
            rpn_layer_nums=(1,),
            rpn_strides=(1,),
            rpn_filters=(32,),
            rpn_up_strides=(1,),
            rpn_up_filters=(32,),
        )
        assert cfg.feature_hw == (8, 8)  # 32 / 2^2 middle / 1 rpn
        model = VoxelNet(cfg, dtype=jnp.float32)
        cloud = make_cloud([(2, 3, 0, 2, 4, 1.6, 0.3)])
        vox = voxelize(jnp.array(cloud), jnp.ones(len(cloud), bool), grid3d,
                       max_voxels=512, max_points_per_voxel=4)
        inputs = tuple(
            v[None] for v in (vox["voxels"], vox["num_points"], vox["coords"],
                              vox["voxel_valid"])
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
        preds = jax.jit(model.apply)(params, *inputs)
        anchors, *_ = cfg.make_anchors()
        assert preds["box"].shape == (1, anchors.shape[0], 7)
        assert np.isfinite(np.asarray(preds["box"])).all()

        def lf(p):
            out = model.apply(p, *inputs)
            return jnp.mean(out["box"] ** 2) + jnp.mean(out["cls"] ** 2)

        g = jax.jit(jax.grad(lf))(params)
        assert np.isfinite(float(optax.global_norm(g)))


class TestPrunedAssign:
    def test_matches_full_assignment_on_masked_anchors(self):
        anchors, mt, ut, cls = generate_anchors((16, 16), GRID.point_cloud_range, [SPEC])
        gt = jnp.array([[2.0, 3.0, 0.0, 2.0, 4.0, 1.6, 0.4]], jnp.float32)
        gt_cls = jnp.array([1], jnp.int32)
        gt_valid = jnp.array([True])
        # Mask: anchors within 8 m of the GT.
        mask = jnp.linalg.norm(np.asarray(anchors)[:, :2] - np.array([2.0, 3.0]), axis=1) < 8.0
        from lyft3d_tpu.ops.anchors import assign_targets_pruned

        full = assign_targets(anchors, cls, mt, ut, gt, gt_cls, gt_valid,
                              anchor_mask=jnp.asarray(mask), similarity="rotated")
        pruned = assign_targets_pruned(anchors, cls, mt, ut, gt, gt_cls, gt_valid,
                                       jnp.asarray(mask), max_active=256,
                                       similarity="rotated")
        np.testing.assert_array_equal(np.asarray(full["labels"]),
                                      np.asarray(pruned["labels"]))
        np.testing.assert_allclose(np.asarray(full["bbox_targets"]),
                                   np.asarray(pruned["bbox_targets"]), atol=1e-5)
        assert int((np.asarray(pruned["labels"]) == 1).sum()) >= 1

    def test_capacity_overflow_drops_extras(self):
        anchors, mt, ut, cls = generate_anchors((16, 16), GRID.point_cloud_range, [SPEC])
        gt = jnp.array([[2.0, 3.0, 0.0, 2.0, 4.0, 1.6, 0.4]], jnp.float32)
        from lyft3d_tpu.ops.anchors import assign_targets_pruned

        mask = jnp.ones((anchors.shape[0],), bool)
        out = assign_targets_pruned(anchors, cls, mt, ut, gt,
                                    jnp.array([1], jnp.int32), jnp.array([True]),
                                    mask, max_active=64)
        lab = np.asarray(out["labels"])
        assert (lab != -1).sum() == 64  # only the first 64 active slots decided


def test_feature_hw_respects_fractional_up_strides():
    """Anchor grid = grid / (middle_ds * rpn_strides[0] / up_strides[0]) —
    the reference all.fhd lands its 9-class head at ~62² (69k anchors) via
    upsample_strides < 1; feature_hw must match the RPN's actual output."""
    from lyft3d_tpu.models.second.voxelnet import VoxelNetConfig
    from lyft3d_tpu.ops.voxelize import VoxelGrid

    grid = VoxelGrid(point_cloud_range=(-49.6, -49.6, -5.0, 49.6, 49.6, 3.0),
                     voxel_size=(0.2, 0.2, 8.0))
    cfg = VoxelNetConfig(grid=grid, rpn_up_strides=(0.25, 0.5, 1))
    assert cfg.feature_hw == (62, 62)
    anchors, _, _, _ = cfg.make_anchors()
    assert anchors.shape[0] == 62 * 62 * cfg.anchors_per_loc

    default = VoxelNetConfig(grid=grid)  # up_strides[0]=1 -> grid/2
    assert default.feature_hw == (248, 248)
