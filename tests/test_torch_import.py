"""Torch checkpoint → flax params importer (utils/torch_import.py).

Validates against a real torch module mirroring the reference senet layout
(unet_baseline/models/modelzoo/senet.py): conv transposes are functionally
checked against torch conv outputs, BN folding against torch eval-mode BN,
and the full seresnext26 subtree import against the flax param structure.
"""


import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from lyft3d_tpu.utils.torch_import import (
    conv_kernel,
    dense_kernel,
    fold_bn,
    inflate_input_channels,
    load_pretrained_backbone,
    normalize_state_dict,
    seresnext_params_from_torch,
)


def _torch_seresnext26(in_ch=3):
    """Reference-senet-shaped torch model (layer0 + 4 stages of 2 blocks)."""
    import torch.nn as nn

    class SEModule(nn.Module):
        def __init__(self, c, r=16):
            super().__init__()
            self.fc1 = nn.Conv2d(c, max(c // r, 4), 1)
            self.fc2 = nn.Conv2d(max(c // r, 4), c, 1)

    class Block(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            inner = cout // 2
            self.conv1 = nn.Conv2d(cin, inner, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(inner)
            self.conv2 = nn.Conv2d(inner, inner, 3, stride, 1, groups=32, bias=False)
            self.bn2 = nn.BatchNorm2d(inner)
            self.conv3 = nn.Conv2d(inner, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.se_module = SEModule(cout)
            if cin != cout or stride != 1:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
                )

    class Layer0(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.layer0 = Layer0()
            feats = (256, 512, 1024, 2048)
            cin = 64
            for si, f in enumerate(feats):
                blocks = []
                for bi in range(2):
                    blocks.append(Block(cin, f, 2 if (si > 0 and bi == 0) else 1))
                    cin = f
                setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    net = Net()
    # Non-trivial BN stats so folding is actually exercised.
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0.1, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0.0, 0.2)
    return net


def test_conv_kernel_transpose_matches_torch():
    w = torch.randn(8, 3, 3, 3)
    conv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    with torch.no_grad():
        conv.weight.copy_(w)
    x = torch.randn(2, 3, 16, 16)
    ref = conv(x).detach().numpy()  # NCHW

    k = conv_kernel(w.numpy())  # HWIO
    x_nhwc = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = jax.lax.conv_general_dilated(
        x_nhwc, jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref, atol=1e-4)


def test_grouped_conv_kernel_transpose_matches_torch():
    conv = torch.nn.Conv2d(64, 64, 3, padding=1, groups=32, bias=False)
    x = torch.randn(1, 64, 8, 8)
    ref = conv(x).detach().numpy()
    k = conv_kernel(conv.weight.detach().numpy())
    x_nhwc = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = jax.lax.conv_general_dilated(
        x_nhwc, jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=32,
    )
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref, atol=1e-4)


def test_fold_bn_matches_torch_eval_affine():
    bn = torch.nn.BatchNorm2d(16).eval()
    with torch.no_grad():
        bn.running_mean.normal_(0, 1)
        bn.running_var.uniform_(0.5, 2)
        bn.weight.normal_(1, 0.3)
        bn.bias.normal_(0, 0.3)
    x = torch.randn(2, 16, 4, 4)
    ref = bn(x).detach().numpy()
    sd = {f"bn.{k}": v.numpy() for k, v in bn.state_dict().items()}
    ab = fold_bn(sd, "bn")
    got = x.numpy() * ab["scale"][None, :, None, None] + ab["bias"][None, :, None, None]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_dense_kernel_from_1x1_conv():
    w = np.random.randn(4, 16, 1, 1).astype(np.float32)
    k = dense_kernel(w)
    assert k.shape == (16, 4)
    np.testing.assert_allclose(k, w[:, :, 0, 0].T)


def test_inflate_input_channels_preserves_magnitude():
    k = np.random.randn(7, 7, 3, 64).astype(np.float32)
    k6 = inflate_input_channels(k, 6)
    assert k6.shape == (7, 7, 6, 64)
    # A 6-channel input that duplicates the 3 channels produces the same
    # pre-activation as the original on the 3-channel input.
    x3 = np.random.randn(3)
    pre_orig = np.einsum("c,hwco->hwo", x3, k)
    pre_new = np.einsum("c,hwco->hwo", np.concatenate([x3, x3]), k6)
    np.testing.assert_allclose(pre_new, pre_orig, rtol=1e-5, atol=1e-6)


def test_seresnext26_full_import_into_unet():
    from lyft3d_tpu.models import build_model

    net = _torch_seresnext26(in_ch=3)
    sd = normalize_state_dict(net.state_dict())
    model = build_model("unet_seresnext26", n_classes=10)
    x = jnp.zeros((1, 64, 64, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    new_params = load_pretrained_backbone(params, sd, "seresnext26", in_channels=6)

    # Same tree structure and shapes.
    old_shapes = jax.tree_util.tree_map(np.shape, params)
    new_shapes = jax.tree_util.tree_map(np.shape, new_params)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, old_shapes, new_shapes)
    )

    # The stem kernel really changed to the (inflated) torch weights.
    bb = new_params["params"]["SEResNeXt_0"]
    stem = bb["ConvNormAct_0"]["Conv_0"]["kernel"]
    expect = inflate_input_channels(
        conv_kernel(net.layer0.conv1.weight.detach().numpy()), 6
    )
    np.testing.assert_allclose(np.asarray(stem), expect, atol=1e-6)

    # A grouped conv deep in the net matches too (block 2 = layer2.0).
    got = np.asarray(bb["SEResNeXtBlock_2"]["ConvNormAct_1"]["Conv_0"]["kernel"])
    ref = conv_kernel(net.layer2[0].conv2.weight.detach().numpy())
    np.testing.assert_allclose(got, ref, atol=1e-6)

    # Downsample branch present exactly where torch has one.
    assert "ConvNormAct_3" in new_params["params"]["SEResNeXt_0"]["SEResNeXtBlock_2"]

    # Model still applies.
    logits, aux = model.apply(new_params, x)
    assert logits.shape == (1, 64, 64, 10)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_module_prefix_and_wrapper_stripping():
    sd = {"module.layer0.conv1.weight": torch.randn(4, 3, 7, 7)}
    flat = normalize_state_dict({"state_dict": sd})
    assert list(flat) == ["layer0.conv1.weight"]
    assert flat["layer0.conv1.weight"].shape == (4, 3, 7, 7)


def test_unknown_backbone_raises():
    with pytest.raises(KeyError):
        load_pretrained_backbone({"params": {}}, {}, "dpn68")


def test_seresnext_subtree_shapes_match_flax_init():
    """Every converted leaf lands on a same-shape flax leaf (nothing skipped)."""
    from lyft3d_tpu.models.backbones import build_backbone

    net = _torch_seresnext26(in_ch=3)
    sd = normalize_state_dict(net.state_dict())
    converted = seresnext_params_from_torch(sd, stage_sizes=(2, 2, 2, 2), in_channels=6)

    bb = build_backbone("seresnext26")
    params = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)))["params"]

    flat_conv = jax.tree_util.tree_leaves_with_path(converted)
    flat_ref = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }
    assert flat_conv, "conversion produced no leaves"
    for path, leaf in flat_conv:
        key = jax.tree_util.keystr(path)
        assert key in flat_ref, f"converted leaf {key} not in flax params"
        assert flat_ref[key] == np.shape(leaf), key


def test_cli_import_weights(tmp_path):
    from lyft3d_tpu.cli import main

    net = _torch_seresnext26(in_ch=3)
    ckpt_path = tmp_path / "imagenet_seresnext26.pth"
    torch.save(net.state_dict(), ckpt_path)
    out = tmp_path / "pretrained"
    main([
        "import-weights", "--torch-ckpt", str(ckpt_path),
        "--backbone", "seresnext26", "--out", str(out),
        "--image-size", "64",
    ])
    assert (out / "unet_seresnext26-0.ckpt").exists()

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject)


def _torch_efficientnet(variant="b1", in_ch=3):
    """efficientnet-pytorch-shaped torch model (the reference's
    modelzoo/efficientNet.py layout: _conv_stem/_bn0 + _blocks.{i} with
    _expand_conv/_bn0, _depthwise_conv/_bn1, _se_reduce/_se_expand,
    _project_conv/_bn2)."""
    import torch.nn as nn

    from lyft3d_tpu.models.backbones.efficientnet import (
        _BASE_BLOCKS,
        _SCALING,
        _round_filters,
        _round_repeats,
    )

    wm, dm = _SCALING[variant]

    class MB(nn.Module):
        def __init__(self, cin, cout, expand, k):
            super().__init__()
            mid = cin * expand
            if expand != 1:
                self._expand_conv = nn.Conv2d(cin, mid, 1, bias=False)
                self._bn0 = nn.BatchNorm2d(mid)
            self._depthwise_conv = nn.Conv2d(
                mid, mid, k, 1, k // 2, groups=mid, bias=False
            )
            self._bn1 = nn.BatchNorm2d(mid)
            se = max(1, cin // 4)
            self._se_reduce = nn.Conv2d(mid, se, 1)
            self._se_expand = nn.Conv2d(se, mid, 1)
            self._project_conv = nn.Conv2d(mid, cout, 1, bias=False)
            self._bn2 = nn.BatchNorm2d(cout)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            stem = _round_filters(32, wm)
            self._conv_stem = nn.Conv2d(in_ch, stem, 3, 2, 1, bias=False)
            self._bn0 = nn.BatchNorm2d(stem)
            blocks, cin = [], stem
            for expand, ch, reps, _stride, k in _BASE_BLOCKS:
                f = _round_filters(ch, wm)
                for _ in range(_round_repeats(reps, dm)):
                    blocks.append(MB(cin, f, expand, k))
                    cin = f
            self._blocks = nn.ModuleList(blocks)

    net = Net()
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0.1, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    return net


def test_efficientnet_b1_full_import_into_unet():
    """The efficientnet-pytorch layout (the reference's efficientNet.py /
    hub checkpoints) imports 1:1 into the flax EfficientNet trunk."""
    from lyft3d_tpu.models import build_model

    net = _torch_efficientnet("b1", in_ch=3)
    sd = normalize_state_dict(net.state_dict())
    model = build_model("unet_efficientnet_b1", n_classes=10)
    x = jnp.zeros((1, 64, 64, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    new_params = load_pretrained_backbone(
        params, sd, "efficientnet_b1", in_channels=6
    )

    old_shapes = jax.tree_util.tree_map(np.shape, params)
    new_shapes = jax.tree_util.tree_map(np.shape, new_params)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, old_shapes, new_shapes)
    )

    bb = new_params["params"]["EfficientNet_0"]
    stem = bb["ConvNormAct_0"]["Conv_0"]["kernel"]
    expect = inflate_input_channels(
        conv_kernel(net._conv_stem.weight.detach().numpy()), 6
    )
    np.testing.assert_allclose(np.asarray(stem), expect, atol=1e-6)

    # A depthwise kernel deep in the net matches (block 3 expands 6x).
    got = np.asarray(bb["MBConv_3"]["ConvNormAct_1"]["Conv_0"]["kernel"])
    ref = conv_kernel(net._blocks[3]._depthwise_conv.weight.detach().numpy())
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # SE gate weights land in the Dense pair.
    got_se = np.asarray(bb["MBConv_3"]["Dense_0"]["kernel"])
    ref_se = dense_kernel(net._blocks[3]._se_reduce.weight.detach().numpy())
    np.testing.assert_allclose(got_se, ref_se, atol=1e-6)

    logits, aux = model.apply(new_params, x)
    assert logits.shape == (1, 64, 64, 10)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
