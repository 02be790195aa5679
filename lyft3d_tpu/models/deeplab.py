"""DeepLabV3+ BEV segmentation family (flax, NHWC).

Capability of the reference's
``deeplab_v3_baseline/semantic_segmentation/network/deepv3.py``
(``DeepV3Plus:95-205``: trunk with stride-8 dilation surgery → ASPP(rates
6/12/18) → low-level m1 skip from stage 1 → decoder convs → full-res head;
``DeepWV3Plus:208-297`` wide variant) and the EfficientNet-UNet
(``ef_unet.py:12-107``, built on stage features + a plain UNet decoder).

Returns ``(logits (N, H, W, n_classes), aux_logits (N, n_classes))`` like
the UNet family so one trainer drives both.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.backbones import build_backbone
from lyft3d_tpu.models.layers import ASPP, ConvNormAct, UpBlock, resize_to
from lyft3d_tpu.models.registry import register_model


class DeepLabV3Plus(nn.Module):
    backbone: str = "seresnext50"
    n_classes: int = 10
    aspp_features: int = 256
    low_features: int = 48
    output_stride: int = 8
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        in_hw = x.shape[1:3]
        x = x.astype(self.dtype)
        feats = build_backbone(
            self.backbone, output_stride=self.output_stride, dtype=self.dtype,
            norm_type=self.norm_type,
        )(x)
        low = feats[0]  # /4 (the m1 skip, deepv3.py:155-160)
        high = feats[3]  # /8 after surgery

        a = ASPP(self.aspp_features, rates=(6, 12, 18), dtype=self.dtype,
                 norm_type=self.norm_type)(high)
        aux = nn.Dense(self.n_classes, dtype=jnp.float32)(
            jnp.mean(a, axis=(1, 2)).astype(jnp.float32)
        )

        a = resize_to(a, low.shape[1:3])
        low = ConvNormAct(self.low_features, kernel=1, dtype=self.dtype,
                          norm_type=self.norm_type)(low)
        d = jnp.concatenate([a, low], axis=-1)
        d = ConvNormAct(self.aspp_features, dtype=self.dtype,
                        norm_type=self.norm_type)(d)
        d = ConvNormAct(self.aspp_features, dtype=self.dtype,
                        norm_type=self.norm_type)(d)
        # 1x1 conv commutes with bilinear resize — logits at /4 then
        # upsample n_classes channels (exact, far less resize traffic).
        logits = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32)(d)
        logits = resize_to(logits, in_hw)
        return logits, aux


class EfficientNetUNet(nn.Module):
    """smp-style UnetDecoder over EfficientNet stage features (ef_unet.py)."""

    backbone: str = "efficientnet_b3"
    n_classes: int = 10
    decoder_features: Tuple[int, ...] = (256, 128, 64, 32)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        in_hw = x.shape[1:3]
        x = x.astype(self.dtype)
        feats = build_backbone(self.backbone, dtype=self.dtype)(x)
        aux = nn.Dense(self.n_classes, dtype=jnp.float32)(
            jnp.mean(feats[3], axis=(1, 2)).astype(jnp.float32)
        )
        d = feats[3]
        for f, skip in zip(self.decoder_features, (feats[2], feats[1], feats[0], None)):
            d = UpBlock(f, dtype=self.dtype)(d, skip)
        logits = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32)(d)
        logits = resize_to(logits, in_hw)
        return logits, aux


@register_model("deeplab_seresnext50")
def _dl50(n_classes: int = 10, **kw):
    return DeepLabV3Plus(backbone="seresnext50", n_classes=n_classes, **kw)


@register_model("deeplab_seresnext101")
def _dl101(n_classes: int = 10, **kw):
    return DeepLabV3Plus(backbone="seresnext101", n_classes=n_classes, **kw)


@register_model("deeplab_wide_resnet38")
def _dlw38(n_classes: int = 10, **kw):
    """DeepWV3Plus capability (deepv3.py:208-297)."""
    return DeepLabV3Plus(backbone="wide_resnet38", n_classes=n_classes, **kw)


@register_model("deeplab_resnet50")
def _dlr50(n_classes: int = 10, **kw):
    return DeepLabV3Plus(backbone="resnet50", n_classes=n_classes, **kw)


@register_model("efficientnet_b3_unet")
def _eb3(n_classes: int = 10, **kw):
    return EfficientNetUNet(backbone="efficientnet_b3", n_classes=n_classes, **kw)


@register_model("efficientnet_b5_unet")
def _eb5(n_classes: int = 10, **kw):
    return EfficientNetUNet(backbone="efficientnet_b5", n_classes=n_classes, **kw)
