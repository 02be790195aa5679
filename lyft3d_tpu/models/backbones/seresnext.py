"""SE-ResNeXt encoder (flax, NHWC, grouped convs on the MXU).

Capability of modelzoo/senet.py (se_resnext50/101_32x4d:436-447) and
senet2.py (seresnext26): ResNeXt bottlenecks (cardinality 32) with
squeeze-and-excitation gates.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.layers import ConvNormAct, SEModule


class SEResNeXtBlock(nn.Module):
    features: int  # output channels
    strides: int = 1
    dilation: int = 1
    cardinality: int = 32
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inner = self.features // 2
        y = ConvNormAct(inner, kernel=1, dtype=self.dtype, norm_type=self.norm_type)(x)
        y = ConvNormAct(
            inner,
            strides=self.strides,
            dilation=self.dilation,
            groups=self.cardinality,
            dtype=self.dtype,
            norm_type=self.norm_type,
        )(y)
        y = ConvNormAct(self.features, kernel=1, act=False, dtype=self.dtype, norm_type=self.norm_type)(y)
        y = SEModule(dtype=self.dtype)(y)
        if x.shape[-1] != self.features or self.strides != 1:
            x = ConvNormAct(
                self.features, kernel=1, strides=self.strides, act=False, dtype=self.dtype, norm_type=self.norm_type
            )(x)
        return nn.relu(x + y)


class SEResNeXt(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stage_features: Sequence[int] = (256, 512, 1024, 2048)
    cardinality: int = 32
    output_stride: int = 32  # 8 applies the DeepLab dilation surgery
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = ConvNormAct(64, kernel=7, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        # torch-style symmetric pad (matches the reference stem maxpool)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        dilations = {32: (1, 1, 1, 1), 16: (1, 1, 1, 2), 8: (1, 1, 2, 4)}[self.output_stride]
        for si, (n_blocks, f) in enumerate(zip(self.stage_sizes, self.stage_features)):
            dil = dilations[si]
            for bi in range(n_blocks):
                strides = 2 if (si > 0 and bi == 0 and dil == 1) else 1
                x = SEResNeXtBlock(
                    f,
                    strides=strides,
                    dilation=dil,
                    cardinality=self.cardinality,
                    dtype=self.dtype,
                    norm_type=self.norm_type,
                )(x)
            feats.append(x)
        return tuple(feats)


def seresnext26(**kw):
    return SEResNeXt(stage_sizes=(2, 2, 2, 2), **kw)


def seresnext50(**kw):
    return SEResNeXt(stage_sizes=(3, 4, 6, 3), **kw)


def seresnext101(**kw):
    return SEResNeXt(stage_sizes=(3, 4, 23, 3), **kw)
