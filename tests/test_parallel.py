"""Sharding/mesh tests on the 8-device virtual CPU platform."""


import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from lyft3d_tpu.models.pointrcnn.net import PointRCNNConfig, proposal_layer
from lyft3d_tpu.ops.bin_coder import BinCoderConfig
from lyft3d_tpu.parallel.mesh import (
    data_parallel_sharding,
    make_mesh,
    replicate,
    shard_batch,
    tensor_parallel_params,
)


class TestMesh:
    def test_mesh_shapes(self):
        mesh = make_mesh(8, model_parallel=2)
        assert mesh.shape == {"data": 4, "model": 2}
        mesh = make_mesh(8)
        assert mesh.shape == {"data": 8, "model": 1}

    def test_shard_batch_places_on_data_axis(self):
        mesh = make_mesh(8)
        batch = {"x": np.arange(16.0).reshape(16, 1)}
        sharded = shard_batch(mesh, batch)
        shard_shapes = {s.data.shape for s in sharded["x"].addressable_shards}
        assert shard_shapes == {(2, 1)}

    def test_replicate(self):
        mesh = make_mesh(4)
        tree = replicate(mesh, {"w": np.ones((3, 3))})
        assert len(tree["w"].addressable_shards) >= 1
        np.testing.assert_allclose(np.asarray(tree["w"]), 1.0)

    def test_tensor_parallel_shards_wide_kernels(self):
        mesh = make_mesh(8, model_parallel=2)
        params = {
            "conv": {"kernel": np.ones((3, 3, 64, 512), np.float32)},
            "small": {"kernel": np.ones((3, 3, 8, 16), np.float32)},
            "bias": {"bias": np.ones((512,), np.float32)},
        }
        placed = tensor_parallel_params(mesh, params, min_features=256)
        wide = placed["conv"]["kernel"]
        assert wide.sharding.spec == P(None, None, None, "model")
        assert placed["small"]["kernel"].sharding.spec == P()

    def test_psum_under_mesh(self):
        # DP gradient all-reduce semantics: jit over sharded inputs reduces
        # across the mesh without explicit collectives in user code.
        mesh = make_mesh(8)
        batch = shard_batch(mesh, {"x": np.arange(8.0)})

        @jax.jit
        def total(b):
            return jnp.sum(b["x"] ** 2)

        assert float(total(batch)) == float((np.arange(8.0) ** 2).sum())


class TestDistanceBucketNMS:
    def test_quota_split(self):
        cfg = PointRCNNConfig(
            num_proposals=10, nms_pre=64, distance_bucket=True,
            bucket_radius=20.0, near_fraction=0.7,
            rpn_coder=BinCoderConfig(),
        )
        rng = np.random.RandomState(0)
        # 12 near points on a radius-10 ring, 12 far on radius-45 —
        # well-separated so NMS keeps everything.
        ang = np.linspace(0, 2 * np.pi, 13)[:12]
        near_xy = np.stack([10 * np.cos(ang), 10 * np.sin(ang)], -1)
        far_xy = np.stack([45 * np.cos(ang), 45 * np.sin(ang)], -1)
        n = 24
        xyz = np.zeros((n, 3), np.float32)
        xyz[:12, :2] = near_xy
        xyz[12:, :2] = far_xy
        reg = np.zeros((n, cfg.rpn_coder.channels), np.float32)
        cls = rng.uniform(1.0, 5.0, n).astype(np.float32)
        out = proposal_layer(
            jnp.asarray(xyz), jnp.asarray(cls), jnp.asarray(reg),
            jnp.ones(n, bool), cfg,
        )
        rois = np.asarray(out["rois"])
        valid = np.asarray(out["roi_valid"])
        assert rois.shape == (10, 7)
        dist = np.linalg.norm(rois[valid][:, :2], axis=1)
        # 7 near slots, 3 far slots.
        assert (dist < 25).sum() == 7
        assert (dist >= 25).sum() == 3


class TestDataParallelStep:
    def test_dp_gradients_match_single_device(self):
        """An 8-way DP step must produce the same params as single-device
        (the all-reduce mean == full-batch gradient)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from lyft3d_tpu.parallel.mesh import (
            make_mesh,
            make_train_step_dp,
            replicate,
            shard_batch,
        )

        w0 = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
        rng = np.random.RandomState(0)
        batch = {
            "x": rng.randn(16, 4).astype(np.float32),
            "y": rng.randn(16, 3).astype(np.float32),
        }

        def loss_fn(p, b):
            pred = b["x"] @ p["w"] + p["b"]
            return jnp.mean((pred - b["y"]) ** 2)

        tx = optax.sgd(0.1)

        # single device
        loss, grads = jax.value_and_grad(loss_fn)(w0, batch)
        upd, _ = tx.update(grads, tx.init(w0), w0)
        ref = optax.apply_updates(w0, upd)

        mesh = make_mesh(8)
        step = make_train_step_dp(loss_fn, tx, mesh)
        params = replicate(mesh, w0)
        opt_state = replicate(mesh, tx.init(w0))
        got, _, dp_loss = step(params, opt_state, shard_batch(mesh, batch))

        np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(ref["w"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(dp_loss), float(loss), rtol=1e-5)


class TestColumnSparseDP:
    def test_column_middle_dp_gradients_match_single_device(self):
        """8-way DP gradients THROUGH the column-sparse middle (the parity
        SECOND path) equal the single-device full-batch gradients — the
        DataParallel capability (train.py:207-208) for SpMiddleFHD."""
        import optax

        from lyft3d_tpu.models.second.middle import SparseMiddleColumns
        from lyft3d_tpu.ops.sparse_conv import ActiveSet
        from lyft3d_tpu.parallel.mesh import (
            make_mesh,
            make_train_step_dp,
            replicate,
            shard_batch,
        )

        rng = np.random.RandomState(0)
        b, cap, n_act = 8, 48, 40
        shape = (12, 12, 4)
        coords, valids = [], []
        for _ in range(b):
            flat = np.sort(rng.choice(np.prod(shape), n_act, replace=False))
            # (y, x, z)-major decode keeps the voxelize-contract ordering.
            z = flat % shape[2]
            x = (flat // shape[2]) % shape[0]
            y = flat // (shape[2] * shape[0])
            c = np.stack([x, y, z], -1).astype(np.int32)
            coords.append(np.concatenate([c, np.zeros((cap - n_act, 3), np.int32)]))
            valids.append(
                np.concatenate([np.ones(n_act, bool), np.zeros(cap - n_act, bool)])
            )
        batch = {
            "feats": rng.randn(b, cap, 3).astype(np.float32),
            "coords": np.stack(coords),
            "valid": np.stack(valids),
        }

        model = SparseMiddleColumns(
            stage_features=(4, 8), stage_max_voxels=(48, 32),
            dtype=jnp.float32, assume_sorted_voxels=True,
        )
        act0 = jax.vmap(
            lambda c, v: ActiveSet(coords=c, valid=v, spatial_shape=shape)
        )(jnp.asarray(batch["coords"]), jnp.asarray(batch["valid"]))
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["feats"]), act0
        )

        def loss_fn(p, bt):
            act = jax.vmap(
                lambda c, v: ActiveSet(coords=c, valid=v, spatial_shape=shape)
            )(bt["coords"], bt["valid"])
            bev, _ = model.apply(p, bt["feats"], act)
            return jnp.mean(bev.astype(jnp.float32) ** 2)

        tx = optax.sgd(0.5)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        upd, _ = tx.update(grads, tx.init(params), params)
        ref = optax.apply_updates(params, upd)

        mesh = make_mesh(8)
        step = make_train_step_dp(loss_fn, tx, mesh)
        dp_params = replicate(mesh, params)
        opt_state = replicate(mesh, tx.init(params))
        got, _, dp_loss = step(dp_params, opt_state, shard_batch(mesh, batch))

        np.testing.assert_allclose(float(dp_loss), float(loss), rtol=1e-5)
        flat_ref = jax.tree_util.tree_leaves(ref)
        flat_got = jax.tree_util.tree_leaves(got)
        for r, g in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5
            )


class TestUnitSparseDP:
    def test_unit_middle_dp_gradients_match_single_device(self):
        """8-way DP gradients THROUGH the z-slab UNIT sparse middle (the
        round-3 production sparse path) equal single-device full-batch
        gradients — DataParallel (train.py:207-208) for SpMiddleFHD."""
        import optax

        from lyft3d_tpu.models.second.middle import SparseMiddleUnits
        from lyft3d_tpu.ops.sparse_conv import ActiveSet
        from lyft3d_tpu.parallel.mesh import (
            make_mesh,
            make_train_step_dp,
            replicate,
            shard_batch,
        )

        rng = np.random.RandomState(1)
        b, cap, n_act = 8, 48, 40
        shape = (12, 12, 4)
        coords, valids = [], []
        for _ in range(b):
            flat = np.sort(rng.choice(np.prod(shape), n_act, replace=False))
            z = flat % shape[2]
            x = (flat // shape[2]) % shape[0]
            y = flat // (shape[2] * shape[0])
            c = np.stack([x, y, z], -1).astype(np.int32)
            coords.append(np.concatenate([c, np.zeros((cap - n_act, 3), np.int32)]))
            valids.append(
                np.concatenate([np.ones(n_act, bool), np.zeros(cap - n_act, bool)])
            )
        batch = {
            "feats": rng.randn(b, cap, 3).astype(np.float32),
            "coords": np.stack(coords),
            "valid": np.stack(valids),
        }

        model = SparseMiddleUnits(
            stage_features=(4, 8), stage_max_voxels=(48, 32), z_slab=2,
            dtype=jnp.float32, assume_sorted_voxels=True,
        )
        act0 = jax.vmap(
            lambda c, v: ActiveSet(coords=c, valid=v, spatial_shape=shape)
        )(jnp.asarray(batch["coords"]), jnp.asarray(batch["valid"]))
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["feats"]), act0
        )

        def loss_fn(p, bt):
            act = jax.vmap(
                lambda c, v: ActiveSet(coords=c, valid=v, spatial_shape=shape)
            )(bt["coords"], bt["valid"])
            bev, _ = model.apply(p, bt["feats"], act)
            return jnp.mean(bev.astype(jnp.float32) ** 2)

        tx = optax.sgd(0.5)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        upd, _ = tx.update(grads, tx.init(params), params)
        ref = optax.apply_updates(params, upd)

        mesh = make_mesh(8)
        step = make_train_step_dp(loss_fn, tx, mesh)
        dp_params = replicate(mesh, params)
        opt_state = replicate(mesh, tx.init(params))
        got, _, dp_loss = step(dp_params, opt_state, shard_batch(mesh, batch))

        np.testing.assert_allclose(float(dp_loss), float(loss), rtol=1e-5)
        flat_ref = jax.tree_util.tree_leaves(ref)
        flat_got = jax.tree_util.tree_leaves(got)
        for r, g in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5
            )


class TestPointRCNNDP:
    def test_rpn_dp_gradients_match_single_device(self):
        """8-way DP gradients through the PointRCNN RPN step (PointNet++
        SA/FP + heads + per-point focal/bin losses) equal single-device
        full-batch gradients — the reference's ``--mgpus`` DataParallel
        capability for PointRCNN (train_rcnn.py:252-253)."""
        import optax

        from lyft3d_tpu.models.pointrcnn.net import (
            PointRCNN_RPN,
            PointRCNNConfig,
            rpn_loss,
            rpn_point_labels,
        )
        from lyft3d_tpu.parallel.mesh import (
            make_mesh,
            make_train_step_dp,
            replicate,
            shard_batch,
        )

        cfg = PointRCNNConfig(
            sa_npoints=(16, 8),
            sa_radii=((2.0,), (4.0,)),
            sa_nsamples=((8,), (8,)),
            sa_widths=(8, 16),
            fp_width=8,
        )
        rng = np.random.RandomState(0)
        b, n = 8, 64
        batch = {
            "points": rng.uniform(-10, 10, (b, n, 3)).astype(np.float32),
            "points_valid": np.ones((b, n), bool),
            "gt_boxes": np.tile(
                np.array([[0.0, 0.0, 0.0, 4.0, 8.0, 3.0, 0.3]], np.float32),
                (b, 2, 1),
            ),
            "gt_valid": np.ones((b, 2), bool),
        }
        model = PointRCNN_RPN(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["points"][0]),
            jnp.zeros((n, 1)),
            jnp.asarray(batch["points_valid"][0]),
        )

        def loss_fn(p, bt):
            def one(xyz, valid, gt, gt_valid):
                labels, assigned = rpn_point_labels(xyz, gt, gt_valid)
                feats = jnp.zeros((xyz.shape[0], 1), xyz.dtype)
                out = model.apply(p, xyz, feats, valid)
                loss, _ = rpn_loss(out, xyz, labels, assigned, gt, cfg)
                return loss

            return jnp.mean(jax.vmap(one)(
                bt["points"], bt["points_valid"], bt["gt_boxes"],
                bt["gt_valid"],
            ))

        tx = optax.sgd(0.1)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        upd, _ = tx.update(grads, tx.init(params), params)
        ref = optax.apply_updates(params, upd)

        mesh = make_mesh(8)
        step = make_train_step_dp(loss_fn, tx, mesh)
        dp_params = replicate(mesh, params)
        opt_state = replicate(mesh, tx.init(params))
        got, _, dp_loss = step(dp_params, opt_state, shard_batch(mesh, batch))

        np.testing.assert_allclose(float(dp_loss), float(loss), rtol=1e-5)
        flat_ref = jax.tree_util.tree_leaves(ref)
        flat_got = jax.tree_util.tree_leaves(got)
        for r, g in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5
            )

    def test_rcnn_dp_gradients_match_single_device(self):
        """8-way DP gradients through the RCNN refinement step (RoI encoder
        SA stack + cls/reg heads + proposal-target losses) equal
        single-device full-batch gradients — the second stage of the
        reference's ``--mgpus`` DataParallel coverage (train_rcnn.py:252-253
        wraps the JOINT net; the RPN stage is pinned by the test above)."""
        import optax

        from lyft3d_tpu.models.pointrcnn.net import (
            PointRCNN_RCNN,
            PointRCNNConfig,
            proposal_target_layer,
            rcnn_loss,
        )
        from lyft3d_tpu.parallel.mesh import (
            make_mesh,
            make_train_step_dp,
            replicate,
            shard_batch,
        )

        cfg = PointRCNNConfig(
            rcnn_sa_npoints=(8, 4),
            rcnn_widths=(8, 16),
            rcnn_sa_radii=(2.0, 4.0),
            rcnn_sa_nsamples=(4, 4),
            roi_points=16,
        )
        rng = np.random.RandomState(1)
        b, r, p, f = 8, 4, 16, 2
        rois = np.concatenate(
            [
                rng.uniform(-8, 8, (b, r, 2)),
                rng.uniform(-1, 1, (b, r, 1)),
                rng.uniform(2, 6, (b, r, 3)),
                rng.uniform(-np.pi, np.pi, (b, r, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
        gt = np.concatenate(
            [
                rng.uniform(-8, 8, (b, 2, 2)),
                rng.uniform(-1, 1, (b, 2, 1)),
                rng.uniform(2, 6, (b, 2, 3)),
                rng.uniform(-np.pi, np.pi, (b, 2, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
        tgts = jax.vmap(
            lambda ro, g: proposal_target_layer(
                ro, jnp.ones((r,), bool), g, jnp.ones((2,), bool), cfg,
                jax.random.PRNGKey(0),
            )
        )(jnp.asarray(rois), jnp.asarray(gt))
        batch = {
            "roi_pts": rng.randn(b, r, p, 3 + f).astype(np.float32),
            "counts": np.full((b, r), p, np.int32),
            "rois": rois,
            "gt": gt,
            "tgts": jax.tree_util.tree_map(np.asarray, tgts),
        }
        model = PointRCNN_RCNN(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["roi_pts"][0]),
            jnp.asarray(batch["counts"][0]),
        )

        def loss_fn(pp, bt):
            def one(rp, cn, ro, tg, g):
                out = model.apply(pp, rp, cn)
                loss, _ = rcnn_loss(out, ro, tg, g, cfg)
                return loss

            return jnp.mean(jax.vmap(one)(
                bt["roi_pts"], bt["counts"], bt["rois"], bt["tgts"],
                bt["gt"],
            ))

        tx = optax.sgd(0.1)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        upd, _ = tx.update(grads, tx.init(params), params)
        ref = optax.apply_updates(params, upd)

        mesh = make_mesh(8)
        step = make_train_step_dp(loss_fn, tx, mesh)
        dp_params = replicate(mesh, params)
        opt_state = replicate(mesh, tx.init(params))
        got, _, dp_loss = step(dp_params, opt_state, shard_batch(mesh, batch))

        np.testing.assert_allclose(float(dp_loss), float(loss), rtol=1e-5)
        for rr, gg in zip(jax.tree_util.tree_leaves(ref),
                          jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(
                np.asarray(gg), np.asarray(rr), rtol=1e-4, atol=1e-5
            )


class TestPointShardedRaster:
    def test_matches_single_device(self):
        """Point-sharded raster + psum == single-device raster (counts are
        additive) — the §5 'shard points over devices' capability."""
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.ops.bev_raster import bev_rasterize_matmul
        from lyft3d_tpu.parallel.mesh import (
            bev_rasterize_point_sharded,
            make_mesh,
        )

        rng = np.random.RandomState(3)
        n = 8 * 512
        pts = jnp.asarray(
            np.column_stack([
                rng.uniform(-60, 60, n), rng.uniform(-60, 60, n),
                rng.uniform(-2.5, 0.5, n),
            ]).astype(np.float32)
        )
        valid = jnp.asarray(rng.rand(n) < 0.9)
        shape = (64, 64, 3)
        ref = bev_rasterize_matmul(pts, valid, shape, (2.1, 2.1, 1.2), -2.0)
        mesh = make_mesh(8)
        got = bev_rasterize_point_sharded(
            mesh, pts, valid, shape=shape, voxel_size=(2.1, 2.1, 1.2),
            z_offset=-2.0,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject)
