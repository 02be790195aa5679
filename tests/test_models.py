"""Model-family shape/jit smoke tests (tiny inputs, CPU)."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lyft3d_tpu.models import build_model, list_models


def _forward(name, in_ch=6, hw=32, n_classes=10):
    model = build_model(name, n_classes=n_classes, dtype=jnp.float32)
    x = jnp.zeros((1, hw, hw, in_ch), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    logits, aux = jax.jit(model.apply)(params, x)
    return logits, aux, params


class TestUNets:
    def test_reference_unet_shapes(self):
        logits, aux, _ = _forward("unet_reference", in_ch=3, hw=32)
        assert logits.shape == (1, 32, 32, 10)
        assert aux.shape == (1, 10)

    def test_seresnext50_unet_shapes(self):
        logits, aux, _ = _forward("unet_seresnext50", hw=32)
        assert logits.shape == (1, 32, 32, 10)
        assert aux.shape == (1, 10)

    def test_resnet34_unet_shapes(self):
        logits, aux, _ = _forward("unet_resnet34", hw=32)
        assert logits.shape == (1, 32, 32, 10)

    def test_nondivisible_input(self):
        # 336 = 16 * 21: /32 stage is 10.5 → rounding; decoder must resize.
        logits, _, _ = _forward("unet_resnet18", hw=56)
        assert logits.shape == (1, 56, 56, 10)

    def test_six_channel_input(self):
        logits, _, _ = _forward("unet_seresnext26", in_ch=6, hw=32)
        assert logits.shape[-1] == 10

    def test_inceptionresnetv2_unet_shapes(self):
        logits, aux, _ = _forward("unet_inceptionresnetv2", hw=32)
        assert logits.shape == (1, 32, 32, 10)
        assert aux.shape == (1, 10)

    def test_registry_lists_families(self):
        names = list_models()
        for expected in (
            "unet_reference",
            "unet_seresnext101",
            "unet_dpn68",
            "unet_efficientnet_b5",
            "unet_xception",
            "unet_inception_v4",
            "unet_inceptionresnetv2",
            "deeplab_seresnext50",
            "deeplab_wide_resnet38",
            "efficientnet_b3_unet",
        ):
            assert expected in names


class TestDeepLab:
    def test_deeplab_shapes(self):
        logits, aux, _ = _forward("deeplab_seresnext50", hw=32)
        assert logits.shape == (1, 32, 32, 10)
        assert aux.shape == (1, 10)

    def test_efficientnet_unet_shapes(self):
        logits, aux, _ = _forward("efficientnet_b3_unet", hw=32)
        assert logits.shape == (1, 32, 32, 10)

    def test_dpn_unet_shapes(self):
        logits, _, _ = _forward("unet_dpn68", hw=32)
        assert logits.shape == (1, 32, 32, 10)


class TestGradients:
    def test_unet_grad_flows(self):
        model = build_model("unet_reference", n_classes=4, wf=3, depth=2, dtype=jnp.float32)
        x = jnp.ones((2, 16, 16, 3), jnp.float32)
        y = jnp.zeros((2, 16, 16), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x)

        def loss_fn(p):
            logits, _ = model.apply(p, x)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, y[..., None], axis=-1))

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


class TestPackedGroupedConv:
    """Grouped conv == block-diagonal dense conv (MXU lane packing)."""

    def test_matches_grouped_conv(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.models.layers import ConvNormAct

        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 64), jnp.float32)
        grouped = ConvNormAct(64, groups=8, norm=False, act=False,
                              pack_groups="never", dtype=jnp.float32)
        packed = ConvNormAct(64, groups=8, norm=False, act=False,
                             pack_groups="always", dtype=jnp.float32)
        pg = grouped.init(jax.random.PRNGKey(7), x)
        pp = packed.init(jax.random.PRNGKey(7), x)
        # identical param tree (same path, same shape) => checkpoints interop
        assert jax.tree_util.tree_structure(pg) == jax.tree_util.tree_structure(pp)
        kg = pg["params"]["Conv_0"]["kernel"]
        assert kg.shape == pp["params"]["Conv_0"]["kernel"].shape == (3, 3, 8, 64)
        out_g = grouped.apply(pg, x)
        out_p = packed.apply(pg, x)  # same weights through the packed path
        np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_p),
                                   rtol=1e-5, atol=1e-5)

    def test_non_power_of_two_groups(self):
        """Supergroup count must divide g (ADVICE r1: in=400, g=10 →
        cing=40, naive sg=3 breaks the reshape; rounded down to 2)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.models.layers import ConvNormAct

        x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 400), jnp.float32)
        grouped = ConvNormAct(400, groups=10, norm=False, act=False,
                              pack_groups="never", dtype=jnp.float32)
        packed = ConvNormAct(400, groups=10, norm=False, act=False,
                             pack_groups="always", dtype=jnp.float32)
        pg = grouped.init(jax.random.PRNGKey(2), x)
        packed.init(jax.random.PRNGKey(2), x)  # must not raise
        np.testing.assert_allclose(
            np.asarray(grouped.apply(pg, x)), np.asarray(packed.apply(pg, x)),
            rtol=1e-5, atol=1e-5,
        )

    def test_gradients_flow_and_strides_dilation(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.models.layers import ConvNormAct

        x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 32), jnp.float32)
        m = ConvNormAct(32, groups=4, strides=2, dilation=2, norm=False,
                        act=False, pack_groups="always", dtype=jnp.float32)
        ref = ConvNormAct(32, groups=4, strides=2, dilation=2, norm=False,
                          act=False, pack_groups="never", dtype=jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(m.apply(p, x)), np.asarray(ref.apply(p, x)),
            rtol=1e-5, atol=1e-5,
        )
        g = jax.grad(lambda pr: jnp.sum(m.apply(pr, x) ** 2))(p)
        gk = np.asarray(g["params"]["Conv_0"]["kernel"])
        assert gk.shape == (3, 3, 8, 32)
        assert np.abs(gk).max() > 0


def test_lyft_unet_backbone_scaled_skip_widths():
    """Skip 1x1 reductions scale with backbone stage channels
    (reference planes = stage_channels // 4, unet.py:33)."""
    import jax
    import jax.numpy as jnp

    from lyft3d_tpu.models.unet import LyftUNet

    m = LyftUNet(backbone="seresnext26", n_classes=4)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)))
    p = params["params"]
    # stages (256, 512, 1024) // 4 -> 64, 128, 256
    assert p["ConvNormAct_0"]["Conv_0"]["kernel"].shape[-1] == 64
    assert p["ConvNormAct_1"]["Conv_0"]["kernel"].shape[-1] == 128
    assert p["ConvNormAct_2"]["Conv_0"]["kernel"].shape[-1] == 256
    logits, aux = m.apply(params, jnp.zeros((1, 64, 64, 6)))
    assert logits.shape == (1, 64, 64, 4) and aux.shape == (1, 4)

    legacy = LyftUNet(backbone="seresnext26", n_classes=4, skip_reduction=0)
    lp = jax.jit(legacy.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)))["params"]
    assert lp["ConvNormAct_2"]["Conv_0"]["kernel"].shape[-1] == 64

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject)
