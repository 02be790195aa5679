"""BEV segmentation UNet family (flax, NHWC).

Two architectures, capability of the reference's two UNets:

- :class:`ReferenceUNet` — the plain Ronneberger encoder-decoder the
  reference trains as its best single model (wf=5, depth=4;
  ``unet-inference-with-map.py:429-546``). Returns per-pixel class logits.
- :class:`LyftUNet` — the modelzoo-backbone UNet
  (``unet_baseline/models/unet.py:26-192``): 4-stage encoder → 1x1 channel
  reductions → ASPP center → SE-gated UpBlock decoder with skip concats →
  hypercolumn concat of all decoder stages → full-res class head, plus an
  auxiliary image-level class head (the ``fc`` head used by the SIZE·BCE
  loss, models/model.py:31-41).

Both take (N, H, W, C_in) with C_in = 3 (lidar BEV) or 6 (+ map channels)
and return ``(logits (N, H, W, n_classes), aux_logits (N, n_classes))``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.backbones import build_backbone
from lyft3d_tpu.models.layers import ASPP, ConvNormAct, UpBlock, resize_to, upsample2x
from lyft3d_tpu.models.registry import register_model


class ReferenceUNet(nn.Module):
    n_classes: int = 10
    wf: int = 5  # first stage has 2**wf features
    depth: int = 4
    norm_type: str = "group"  # "group" | "batch" | "folded" (see ConvNormAct)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        skips = []
        for d in range(self.depth):
            f = 2 ** (self.wf + d)
            x = ConvNormAct(f, dtype=self.dtype, norm_type=self.norm_type)(x)
            x = ConvNormAct(f, dtype=self.dtype, norm_type=self.norm_type)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        f = 2 ** (self.wf + self.depth)
        x = ConvNormAct(f, dtype=self.dtype, norm_type=self.norm_type)(x)
        x = ConvNormAct(f, dtype=self.dtype, norm_type=self.norm_type)(x)
        for d in reversed(range(self.depth)):
            f = 2 ** (self.wf + d)
            x = upsample2x(x)
            skip = skips[d]
            if skip.shape[1:3] != x.shape[1:3]:
                x = resize_to(x, skip.shape[1:3])
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvNormAct(f, dtype=self.dtype, norm_type=self.norm_type)(x)
            x = ConvNormAct(f, dtype=self.dtype, norm_type=self.norm_type)(x)
        logits = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32)(x)
        aux = jnp.mean(logits, axis=(1, 2))
        return logits, aux


class LyftUNet(nn.Module):
    backbone: str = "seresnext50"
    n_classes: int = 10
    decoder_features: int = 64
    aspp_features: int = 256
    # 1x1 skip width = stage_channels // skip_reduction (the reference's
    # ``self.planes = [c // 4 for c in stage_channels]``, unet.py:33 — so
    # skip widths vary by backbone); 0 = fixed ``decoder_features`` width.
    skip_reduction: int = 4
    norm_type: str = "group"  # "group" | "batch" | "folded" (see ConvNormAct)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        in_hw = x.shape[1:3]
        x = x.astype(self.dtype)
        feats = build_backbone(self.backbone, dtype=self.dtype, norm_type=self.norm_type)(x)  # /4 /8 /16 /32

        # 1x1 channel reductions of the skips (down1..4, unet.py:52-58).
        def skip_width(f):
            if self.skip_reduction <= 0:
                return self.decoder_features
            return max(f.shape[-1] // self.skip_reduction, self.decoder_features)

        skips = [
            ConvNormAct(skip_width(f), kernel=1, dtype=self.dtype,
                        norm_type=self.norm_type)(f)
            for f in feats[:3]
        ]

        center = ASPP(self.aspp_features, dtype=self.dtype, norm_type=self.norm_type)(feats[3])
        # Auxiliary image-level head off the center (fc head, unet.py:86-92).
        aux = nn.Dense(self.n_classes, dtype=jnp.float32)(
            jnp.mean(center, axis=(1, 2)).astype(jnp.float32)
        )

        d = center
        decoder_outs = []
        for skip in reversed(skips):  # /32→/16→/8→/4
            d = UpBlock(self.decoder_features, dtype=self.dtype,
                        norm_type=self.norm_type)(d, skip)
            decoder_outs.append(d)
        d = UpBlock(self.decoder_features, dtype=self.dtype,
                        norm_type=self.norm_type)(d, None)  # /2
        decoder_outs.append(d)

        # Hypercolumn: every decoder stage upsampled to /2 res and concatenated
        # (unet.py:160-180).
        hyper = jnp.concatenate(
            [resize_to(o, d.shape[1:3]) for o in decoder_outs], axis=-1
        )
        h = ConvNormAct(self.decoder_features, dtype=self.dtype,
                        norm_type=self.norm_type)(hyper)
        # 1x1 conv commutes with bilinear resize (both linear, channel
        # mixing is pointwise): produce logits at /2 and upsample 10
        # channels instead of 64 — exact same function, 6x less resize
        # traffic (full forward 8.58 -> 7.71 ms at batch 8).
        logits = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32)(h)
        logits = resize_to(logits, in_hw)
        return logits, aux


@register_model("unet_reference")
def _unet_reference(n_classes: int = 10, **kw):
    return ReferenceUNet(n_classes=n_classes, **kw)


def _make_backbone_unet(backbone):
    def ctor(n_classes: int = 10, **kw):
        return LyftUNet(backbone=backbone, n_classes=n_classes, **kw)

    return ctor


for _b in (
    "resnet18",
    "resnet34",
    "resnet50",
    "seresnext26",
    "seresnext50",
    "seresnext101",
    "efficientnet_b1",
    "efficientnet_b2",
    "efficientnet_b3",
    "efficientnet_b5",
    "dpn68",
    "xception",
    "inception_v4",
    "inceptionresnetv2",
):
    register_model(f"unet_{_b}")(_make_backbone_unet(_b))
