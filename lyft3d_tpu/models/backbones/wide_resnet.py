"""WideResNet-38 encoder (flax, NHWC).

Capability of the reference's ``wider_resnet.py`` (395 LoC, the trunk of
``DeepWV3Plus``, deepv3.py:208-297): a wide ResNet with 3-conv identity
blocks arranged (3, 3, 6, 3, 1, 1) and progressively doubled widths.
Returns 4 feature stages (/4, /8, /16, /32) with optional output-stride-8
dilation surgery like the other trunks.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.backbones import register_backbone
from lyft3d_tpu.models.layers import ConvNormAct


class WideBlock(nn.Module):
    features: Tuple[int, int]  # (inner, out)
    strides: int = 1
    dilation: int = 1
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inner, out = self.features
        y = ConvNormAct(inner, strides=self.strides, dilation=self.dilation,
                        dtype=self.dtype, norm_type=self.norm_type)(x)
        y = ConvNormAct(inner, dilation=self.dilation, dtype=self.dtype, norm_type=self.norm_type)(y)
        y = ConvNormAct(out, kernel=1, act=False, dtype=self.dtype, norm_type=self.norm_type)(y)
        if x.shape[-1] != out or self.strides != 1:
            x = ConvNormAct(out, kernel=1, strides=self.strides, act=False,
                            dtype=self.dtype, norm_type=self.norm_type)(x)
        return nn.relu(x + y)


class WideResNet38(nn.Module):
    stage_sizes: Sequence[int] = (3, 3, 6, 3)
    stage_features: Sequence[Tuple[int, int]] = (
        (128, 256), (256, 512), (512, 1024), (1024, 2048),
    )
    output_stride: int = 32
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = ConvNormAct(64, kernel=3, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        x = ConvNormAct(64, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        dilations = {32: (1, 1, 1, 1), 16: (1, 1, 1, 2), 8: (1, 1, 2, 4)}[self.output_stride]
        feats = []
        for si, (n_blocks, f) in enumerate(zip(self.stage_sizes, self.stage_features)):
            dil = dilations[si]
            for bi in range(n_blocks):
                strides = 2 if (si > 0 and bi == 0 and dil == 1) else 1
                x = WideBlock(f, strides=strides, dilation=dil, dtype=self.dtype, norm_type=self.norm_type)(x)
            feats.append(x)
        return tuple(feats)


register_backbone("wide_resnet38", lambda **kw: WideResNet38(**kw))
