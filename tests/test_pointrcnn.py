"""PointRCNN tests: bin coder round-trip, SA/FP modules, proposal layers,
joint net forward + loss gradients on a tiny synthetic scene."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lyft3d_tpu.models.pointrcnn.modules import FPModule, SAModuleMSG
from lyft3d_tpu.models.pointrcnn.net import (
    PointRCNN,
    PointRCNNConfig,
    canonical_transform,
    proposal_layer,
    proposal_target_layer,
    rcnn_loss,
    rpn_loss,
    rpn_point_labels,
)
from lyft3d_tpu.ops.bin_coder import (
    BinCoderConfig,
    bin_reg_loss,
    decode_bin_boxes,
    encode_bin_targets,
)

TINY = PointRCNNConfig(
    sa_npoints=(64, 16),
    sa_radii=((1.0,), (2.0,)),
    sa_nsamples=((8,), (8,)),
    sa_widths=(16, 32),
    fp_width=16,
    num_proposals=8,
    nms_pre=32,
    roi_points=16,
    rcnn_sa_npoints=(8,),
    rcnn_widths=(16,),
    rois_per_image=8,
)


def scene(seed=0, n=256):
    rng = np.random.RandomState(seed)
    gt = np.array(
        [[2.0, 3.0, 0.0, 2.0, 4.0, 1.6, 0.4], [-5.0, -4.0, 0.0, 2.0, 4.0, 1.6, -0.9]],
        np.float32,
    )
    pts = [rng.uniform(-10, 10, (n - 120, 3)).astype(np.float32)]
    for b in gt:
        local = rng.uniform(-0.45, 0.45, (60, 3)) * b[[4, 3, 5]]
        c, s = np.cos(b[6]), np.sin(b[6])
        pts.append(
            np.column_stack(
                [
                    c * local[:, 0] - s * local[:, 1] + b[0],
                    s * local[:, 0] + c * local[:, 1] + b[1],
                    local[:, 2] + b[2],
                ]
            ).astype(np.float32)
        )
    return np.concatenate(pts), gt


class TestBinCoder:
    def test_encode_decode_roundtrip(self):
        cfg = BinCoderConfig(loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12)
        rng = np.random.RandomState(0)
        anchors = rng.uniform(-5, 5, (32, 3)).astype(np.float32)
        gt = np.zeros((32, 7), np.float32)
        gt[:, :3] = anchors + rng.uniform(-2.5, 2.5, (32, 3))
        gt[:, 3:6] = rng.uniform(1, 4, (32, 3))
        gt[:, 6] = rng.uniform(-np.pi, np.pi, 32)
        tgt = encode_bin_targets(jnp.array(anchors), jnp.array(gt), cfg)

        # Build a perfect regression output from the targets.
        sl = cfg.slices()
        reg = np.zeros((32, cfg.channels), np.float32)
        xb = np.asarray(tgt["x_bin"])
        yb = np.asarray(tgt["y_bin"])
        hb = np.asarray(tgt["head_bin"])
        reg[np.arange(32), sl["x_bin"].start + xb] = 10.0
        reg[np.arange(32), sl["y_bin"].start + yb] = 10.0
        reg[np.arange(32), sl["head_bin"].start + hb] = 10.0
        reg[np.arange(32), sl["x_res"].start + xb] = np.asarray(tgt["x_res"])
        reg[np.arange(32), sl["y_res"].start + yb] = np.asarray(tgt["y_res"])
        reg[np.arange(32), sl["head_res"].start + hb] = np.asarray(tgt["head_res"])
        reg[:, sl["z_res"]] = np.asarray(tgt["z_res"])[:, None]
        reg[:, sl["size_res"]] = np.asarray(tgt["size_res"])

        dec = np.asarray(decode_bin_boxes(jnp.array(anchors), jnp.array(reg), cfg))
        np.testing.assert_allclose(dec[:, :3], gt[:, :3], atol=1e-4)
        np.testing.assert_allclose(dec[:, 3:6], gt[:, 3:6], atol=1e-4)
        ang_err = np.abs(np.angle(np.exp(1j * (dec[:, 6] - gt[:, 6]))))
        assert ang_err.max() < 1e-4

    def test_perfect_reg_gives_small_loss(self):
        cfg = BinCoderConfig()
        anchors = jnp.zeros((4, 3))
        gt = jnp.array([[1.0, -0.5, 0.2, 2, 4, 1.5, 0.3]] * 4, jnp.float32)
        tgt = encode_bin_targets(anchors, gt, cfg)
        sl = cfg.slices()
        reg = np.full((4, cfg.channels), -10.0, np.float32)
        xb = np.asarray(tgt["x_bin"])
        reg[np.arange(4), sl["x_bin"].start + xb] = 10.0
        reg[np.arange(4), sl["y_bin"].start + np.asarray(tgt["y_bin"])] = 10.0
        reg[np.arange(4), sl["head_bin"].start + np.asarray(tgt["head_bin"])] = 10.0
        reg[np.arange(4), sl["x_res"].start + xb] = np.asarray(tgt["x_res"])
        reg[np.arange(4), sl["y_res"].start + np.asarray(tgt["y_bin"])] = np.asarray(tgt["y_res"])
        reg[np.arange(4), sl["head_res"].start + np.asarray(tgt["head_bin"])] = np.asarray(tgt["head_res"])
        reg[:, sl["z_res"]] = np.asarray(tgt["z_res"])[:, None]
        reg[:, sl["size_res"]] = np.asarray(tgt["size_res"])
        loss, _ = bin_reg_loss(jnp.array(reg), tgt, jnp.ones(4), cfg)
        assert float(loss) < 0.01


class TestModules:
    def test_sa_module_shapes(self):
        pts, _ = scene()
        xyz = jnp.array(pts)
        feats = jnp.ones((len(pts), 5))
        valid = jnp.ones(len(pts), bool)
        mod = SAModuleMSG(npoint=32, radii=(1.0, 2.0), nsamples=(8, 16),
                          mlps=[[8, 8], [8, 16]])
        params = mod.init(jax.random.PRNGKey(0), xyz, feats, valid)
        nx, nf, nv = mod.apply(params, xyz, feats, valid)
        assert nx.shape == (32, 3) and nf.shape == (32, 24)

    def test_fp_module_shapes(self):
        rng = np.random.RandomState(1)
        ux = jnp.array(rng.randn(64, 3), jnp.float32)
        kx = jnp.array(rng.randn(16, 3), jnp.float32)
        kf = jnp.array(rng.randn(16, 8), jnp.float32)
        uf = jnp.array(rng.randn(64, 4), jnp.float32)
        mod = FPModule([16])
        params = mod.init(jax.random.PRNGKey(0), ux, uf, kx, kf, jnp.ones(16, bool))
        out = mod.apply(params, ux, uf, kx, kf, jnp.ones(16, bool))
        assert out.shape == (64, 16)


class TestLabelsAndTargets:
    def test_rpn_point_labels(self):
        pts, gt = scene()
        labels, assigned = rpn_point_labels(
            jnp.array(pts), jnp.array(gt), jnp.array([True, True])
        )
        lab = np.asarray(labels)
        assert (lab == 1).sum() >= 100  # cluster points are fg
        assert (lab == 0).sum() > 0
        # Points of the second cluster assigned to gt 1.
        a = np.asarray(assigned)
        assert a[-30] == 1

    def test_proposal_target_layer(self):
        gt = jnp.array([[0, 0, 0, 2, 4, 1.6, 0.0]], jnp.float32)
        rois = jnp.array(
            [
                [0, 0, 0, 2, 4, 1.6, 0.0],  # perfect → fg
                [0.2, 0, 0, 2, 4, 1.6, 0.0],  # high IoU → fg
                [5, 5, 0, 2, 4, 1.6, 0.0],  # bg
            ],
            jnp.float32,
        )
        out = proposal_target_layer(
            rois, jnp.array([True] * 3), gt, jnp.array([True]), TINY,
            jax.random.PRNGKey(0),
        )
        fg = np.asarray(out["fg"])
        assert fg[0] and fg[1] and not fg[2]
        assert np.asarray(out["keep"]).all()

    def test_proposal_target_random_sampling_and_hard_bg(self):
        """Randomized fg/bg subsampling + hard-bg mining
        (proposal_target_layer.py:79-211): the rng changes the sample, and
        hard backgrounds get ~hard_bg_ratio of the background quota."""
        rng = np.random.RandomState(0)
        gt = jnp.array([[0, 0, 0, 2, 4, 1.6, 0.0]], jnp.float32)
        # 20 fg (small jitter), 30 hard bg (overlapping but IoU < 0.45),
        # 30 easy bg (far away) — all quotas oversubscribed.
        fg_rois = np.tile([0, 0, 0, 2, 4, 1.6, 0.0], (20, 1))
        fg_rois[:, 0] += rng.uniform(-0.05, 0.05, 20)
        hard_rois = np.tile([1.2, 0.6, 0, 2, 4, 1.6, 0.0], (30, 1))
        easy_rois = np.tile([30, 30, 0, 2, 4, 1.6, 0.0], (30, 1))
        rois = jnp.asarray(
            np.vstack([fg_rois, hard_rois, easy_rois]), jnp.float32
        )
        valid = jnp.ones(80, bool)
        cfg = TINY  # rois_per_image=8, fg_fraction=0.5, hard_bg_ratio=0.8
        out1 = proposal_target_layer(
            rois, valid, gt, jnp.array([True]), cfg, jax.random.PRNGKey(1)
        )
        out2 = proposal_target_layer(
            rois, valid, gt, jnp.array([True]), cfg, jax.random.PRNGKey(2)
        )
        k1, k2 = np.asarray(out1["keep"]), np.asarray(out2["keep"])
        # Quotas: 4 fg + 4 bg; bg = floor(4·0.8)=3 hard + 1 easy.
        for out in (out1, out2):
            keep = np.asarray(out["keep"])
            fg = np.asarray(out["fg"])
            assert keep.sum() == cfg.rois_per_image
            assert fg.sum() == 4 and fg[:20].sum() == 4
            assert keep[20:50].sum() == 3  # hard bg
            assert keep[50:].sum() == 1  # easy bg
        # The rng argument is USED: different keys pick different subsets.
        assert (k1 != k2).any()

    def test_proposal_target_hard_bg_spill(self):
        """When one bg pool runs short, the quota spills to the other."""
        gt = jnp.array([[0, 0, 0, 2, 4, 1.6, 0.0]], jnp.float32)
        # 10 fg, NO hard bg, 30 easy bg → all 4 bg slots go easy.
        fg_rois = np.tile([0, 0, 0, 2, 4, 1.6, 0.0], (10, 1))
        easy_rois = np.tile([30, 30, 0, 2, 4, 1.6, 0.0], (30, 1))
        rois = jnp.asarray(np.vstack([fg_rois, easy_rois]), jnp.float32)
        out = proposal_target_layer(
            rois, jnp.ones(40, bool), gt, jnp.array([True]), TINY,
            jax.random.PRNGKey(0),
        )
        keep = np.asarray(out["keep"])
        assert keep.sum() == TINY.rois_per_image
        assert keep[10:].sum() == 4

    def test_aug_rois_iou_controlled(self):
        """IoU-controlled RoI noise (aug_roi_by_noise_torch:213-240): fg
        RoIs keep IoU ≥ pos_iou with their assigned GT (bounded resampling
        finds a qualifying candidate w.h.p.), and the rng changes the
        perturbation."""
        from lyft3d_tpu.models.pointrcnn.net import (
            _elementwise_iou3d,
            aug_rois_with_noise,
        )

        n = 32
        rois = jnp.asarray(
            np.tile([0, 0, 0, 2.0, 4.0, 1.6, 0.0], (n, 1)), jnp.float32
        )
        gt = rois  # each roi's assigned gt = itself (IoU 1 pre-noise)
        fg = jnp.ones(n, bool)
        out = aug_rois_with_noise(
            rois, jax.random.PRNGKey(0), gt_of_rois=gt, fg=fg,
            pos_iou=0.55, attempts=10,
        )
        iou = np.asarray(_elementwise_iou3d(out, gt))
        # ≥90% of fg rois retain a qualifying candidate within 10 attempts
        # (the reference keeps the last attempt regardless, so a small
        # failure fraction is expected and allowed).
        assert (iou >= 0.55).mean() >= 0.9
        # Noise actually applied (not all boxes identical to the input).
        assert np.abs(np.asarray(out) - np.asarray(rois)).max() > 1e-3
        out2 = aug_rois_with_noise(
            rois, jax.random.PRNGKey(7), gt_of_rois=gt, fg=fg,
            pos_iou=0.55, attempts=10,
        )
        assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4

    def test_aug_rois_bg_single_attempt(self):
        """Non-fg RoIs get exactly one attempt (reference bg aug_times=1):
        with keep_prob=0 the output equals candidate 0 regardless of IoU."""
        from lyft3d_tpu.models.pointrcnn.net import aug_rois_with_noise

        n = 8
        rois = jnp.asarray(
            np.tile([0, 0, 0, 2.0, 4.0, 1.6, 0.0], (n, 1)), jnp.float32
        )
        key = jax.random.PRNGKey(3)
        ctl = aug_rois_with_noise(rois, key, keep_prob=0.0)  # candidate 0
        out = aug_rois_with_noise(
            rois, key, gt_of_rois=rois, fg=jnp.zeros(n, bool),
            pos_iou=0.99, attempts=10, keep_prob=0.0,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ctl), atol=1e-6)

    def test_canonical_transform(self):
        rois = jnp.array([[1.0, 2.0, 0.5, 2, 4, 1.6, np.pi / 2]], jnp.float32)
        pts = jnp.array([[[1.0, 3.0, 0.5]]], jnp.float32)  # 1m ahead along +y
        canon = np.asarray(canonical_transform(pts, rois))[0, 0]
        np.testing.assert_allclose(canon, [1.0, 0.0, 0.0], atol=1e-6)


class TestJointNet:
    def test_forward_and_losses(self):
        pts, gt = scene()
        xyz = jnp.array(pts)
        valid = jnp.ones(len(pts), bool)
        model = PointRCNN(TINY)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), xyz, None, valid)
        out = jax.jit(model.apply)(params, xyz, None, valid)
        assert out["rpn"]["cls"].shape == (len(pts),)
        assert out["proposals"]["rois"].shape == (TINY.num_proposals, 7)
        assert out["rcnn"]["cls"].shape == (TINY.num_proposals,)

        gt_j = jnp.array(gt)
        gt_valid = jnp.array([True, True])
        labels, assigned = rpn_point_labels(xyz, gt_j, gt_valid)

        def loss_fn(p):
            out = model.apply(p, xyz, None, valid)
            l_rpn, m1 = rpn_loss(out["rpn"], xyz, labels, assigned, gt_j, TINY)
            tgts = proposal_target_layer(
                out["proposals"]["rois"], out["proposals"]["roi_valid"],
                gt_j, gt_valid, TINY, jax.random.PRNGKey(0),
            )
            l_rcnn, m2 = rcnn_loss(out["rcnn"], out["proposals"]["rois"], tgts, gt_j, TINY)
            return l_rpn + l_rcnn, {**m1, **m2}

        (loss, metrics), grads = jax.jit(
            lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
        )(params)
        assert np.isfinite(float(loss))
        gn = float(optax.global_norm(grads))
        assert np.isfinite(gn) and gn > 0

    def test_rpn_overfit(self):
        """RPN-only: a few steps should reduce the per-point focal loss."""
        pts, gt = scene(seed=3)
        xyz = jnp.array(pts)
        valid = jnp.ones(len(pts), bool)
        from lyft3d_tpu.models.pointrcnn.net import PointRCNN_RPN

        model = PointRCNN_RPN(TINY)
        feats = jnp.zeros((len(pts), 1))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), xyz, feats, valid)
        labels, assigned = rpn_point_labels(xyz, jnp.array(gt), jnp.array([True, True]))
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def lf(p):
                out = model.apply(p, xyz, feats, valid)
                return rpn_loss(out, xyz, labels, assigned, jnp.array(gt), TINY)

            (l, m), g = jax.value_and_grad(lf, has_aux=True)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, l

        losses = []
        for _ in range(25):
            params, opt, l = step(params, opt)
            losses.append(float(l))
        assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])


class TestSharedMLPBatchFold:
    """norm="batch" (the reference's BatchNorm1d in pytorch_utils.SharedMLP)
    trains with mutable running stats and folds EXACTLY into the
    norm="folded" deployment structure — making "folded" reachable from a
    trained checkpoint (ADVICE r4 medium: LayerNorm cannot fold)."""

    def test_batch_fold_exact(self):
        from lyft3d_tpu.models.fold_bn import fold_batch_norms
        from lyft3d_tpu.models.pointrcnn.modules import SharedMLP

        x = jnp.asarray(
            np.random.RandomState(0).randn(64, 16).astype(np.float32)
        )
        m_b = SharedMLP([32, 24], norm="batch")
        variables = jax.tree_util.tree_map(
            np.asarray, m_b.init(jax.random.PRNGKey(0), x)
        )
        assert "batch_stats" in variables

        # Train-mode apply (mutable stats) updates the running averages.
        _, new_state = m_b.apply(variables, x, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(new_state["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(after, before)
        )

        # Non-trivial stats so the fold is actually exercised.
        rng = np.random.RandomState(1)

        def perturb(node):
            for k, v in node.items():
                if isinstance(v, dict):
                    perturb(v)
                elif k == "mean":
                    node[k] = rng.normal(0.1, 0.5, v.shape).astype(np.float32)
                elif k == "var":
                    node[k] = rng.uniform(0.5, 2.0, v.shape).astype(np.float32)

        perturb(variables["batch_stats"])
        ref = m_b.apply(variables, x)

        m_f = SharedMLP([32, 24], norm="folded")
        folded = fold_batch_norms(variables)
        init_f = m_f.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.shape, folded)
        ) == jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.shape, init_f)
        )
        out = m_f.apply(folded, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
