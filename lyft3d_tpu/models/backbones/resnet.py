"""ResNet encoder (flax, NHWC). Capability of modelzoo/resnet.py."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.layers import ConvNormAct


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = ConvNormAct(
            self.features, strides=self.strides, dilation=self.dilation,
            dtype=self.dtype, norm_type=self.norm_type,
        )(x)
        y = ConvNormAct(self.features, dilation=self.dilation, act=False, dtype=self.dtype, norm_type=self.norm_type)(y)
        if x.shape[-1] != self.features or self.strides != 1:
            x = ConvNormAct(
                self.features, kernel=1, strides=self.strides, act=False, dtype=self.dtype, norm_type=self.norm_type
            )(x)
        return nn.relu(x + y)


class Bottleneck(nn.Module):
    features: int  # output features (4x the inner width)
    strides: int = 1
    dilation: int = 1
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inner = self.features // 4
        y = ConvNormAct(inner, kernel=1, dtype=self.dtype, norm_type=self.norm_type)(x)
        y = ConvNormAct(
            inner, strides=self.strides, dilation=self.dilation,
            dtype=self.dtype, norm_type=self.norm_type,
        )(y)
        y = ConvNormAct(self.features, kernel=1, act=False, dtype=self.dtype, norm_type=self.norm_type)(y)
        if x.shape[-1] != self.features or self.strides != 1:
            x = ConvNormAct(
                self.features, kernel=1, strides=self.strides, act=False, dtype=self.dtype, norm_type=self.norm_type
            )(x)
        return nn.relu(x + y)


class ResNet(nn.Module):
    """Returns the four stage features (/4, /8, /16, /32)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stage_features: Sequence[int] = (64, 128, 256, 512)
    bottleneck: bool = False
    output_stride: int = 32  # 8 applies the DeepLab dilation surgery
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = ConvNormAct(64, kernel=7, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        # torch-style symmetric pad (matches the reference stem maxpool)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        block = Bottleneck if self.bottleneck else BasicBlock
        feats = []
        # stride-8 surgery (deepv3.py:130-146): stages 3/4 keep stride 1 and
        # dilate by 2/4 instead.
        dilations = {32: (1, 1, 1, 1), 16: (1, 1, 1, 2), 8: (1, 1, 2, 4)}[self.output_stride]
        for si, (n_blocks, f) in enumerate(zip(self.stage_sizes, self.stage_features)):
            dil = dilations[si]
            for bi in range(n_blocks):
                strides = 2 if (si > 0 and bi == 0 and dil == 1) else 1
                x = block(f, strides=strides, dilation=dil, dtype=self.dtype, norm_type=self.norm_type)(x)
            feats.append(x)
        return tuple(feats)


def resnet18(**kw):
    return ResNet(stage_sizes=(2, 2, 2, 2), **kw)


def resnet34(**kw):
    return ResNet(stage_sizes=(3, 4, 6, 3), **kw)


def resnet50(**kw):
    return ResNet(
        stage_sizes=(3, 4, 6, 3),
        stage_features=(256, 512, 1024, 2048),
        bottleneck=True,
        **kw,
    )
