"""Xception and Inception-style encoders (flax, NHWC).

Capability of the remaining reference modelzoo entries
(``unet_baseline/models/modelzoo/xception.py`` (193),
``inceptionV4.py`` (337), ``inceptionresnetv2.py`` (360)): depthwise-
separable Xception blocks and multi-branch Inception mixes, exposed as
4-stage encoders like every other backbone.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.backbones import register_backbone
from lyft3d_tpu.models.layers import ConvNormAct


class SeparableConv(nn.Module):
    features: int
    strides: int = 1
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        x = nn.Conv(cin, (3, 3), strides=(self.strides, self.strides),
                    feature_group_count=cin, padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        # Pointwise conv + norm honor norm_type (group/batch/folded) via
        # ConvNormAct so fold_batch_norms can fold the pair; the depthwise
        # conv above carries no norm.
        return ConvNormAct(self.features, kernel=1, act=False,
                           norm_type=self.norm_type, dtype=self.dtype)(x)


class XceptionBlock(nn.Module):
    features: int
    strides: int = 1
    reps: int = 2
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        skip = x
        y = x
        for i in range(self.reps):
            y = nn.relu(y)
            y = SeparableConv(self.features,
                              strides=self.strides if i == self.reps - 1 else 1,
                              dtype=self.dtype, norm_type=self.norm_type)(y)
        if skip.shape[-1] != self.features or self.strides != 1:
            skip = ConvNormAct(self.features, kernel=1, strides=self.strides,
                               act=False, dtype=self.dtype, norm_type=self.norm_type)(skip)
        return y + skip


class Xception(nn.Module):
    stage_features: Sequence[int] = (128, 256, 728, 1024)
    middle_reps: int = 4  # reference middle flow has 8; 4 keeps it light
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = ConvNormAct(32, kernel=3, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        x = ConvNormAct(64, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(x)
        feats = []
        f1, f2, f3, f4 = self.stage_features
        x = XceptionBlock(f1, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        feats.append(x)  # /4
        x = XceptionBlock(f2, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        feats.append(x)  # /8
        x = XceptionBlock(f3, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        for _ in range(self.middle_reps):  # middle flow
            x = XceptionBlock(f3, strides=1, reps=3, dtype=self.dtype, norm_type=self.norm_type)(x)
        feats.append(x)  # /16
        x = XceptionBlock(f4, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        x = nn.relu(SeparableConv(f4 * 2, dtype=self.dtype, norm_type=self.norm_type)(x))
        feats.append(x)  # /32
        return tuple(feats)


class InceptionMix(nn.Module):
    """Multi-branch mix: 1x1 | 3x3 | double-3x3 | pool-1x1 (Inception-v4
    style block A, compacted)."""

    features: int
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        f = self.features // 4
        b1 = ConvNormAct(f, kernel=1, dtype=self.dtype, norm_type=self.norm_type)(x)
        b2 = ConvNormAct(f, kernel=1, dtype=self.dtype, norm_type=self.norm_type)(x)
        b2 = ConvNormAct(f, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(b2)
        b3 = ConvNormAct(f, kernel=1, dtype=self.dtype, norm_type=self.norm_type)(x)
        b3 = ConvNormAct(f, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(b3)
        b3 = ConvNormAct(f, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(b3)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = ConvNormAct(f, kernel=1, dtype=self.dtype, norm_type=self.norm_type)(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV4(nn.Module):
    stage_features: Sequence[int] = (96, 192, 384, 1024)
    blocks_per_stage: Sequence[int] = (1, 2, 3, 2)
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = ConvNormAct(32, kernel=3, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        x = ConvNormAct(64, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(x)
        feats = []
        for f, n in zip(self.stage_features, self.blocks_per_stage):
            x = ConvNormAct(f, kernel=3, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
            for _ in range(n):
                x = InceptionMix(f, dtype=self.dtype, norm_type=self.norm_type)(x)
            feats.append(x)
        return tuple(feats)


class InceptionResBlock(nn.Module):
    """Scaled-residual inception block (``modelzoo/inceptionresnetv2.py``
    Block35/Block17/Block8 pattern): parallel 1x1 / 3x3 / double-3x3
    branches → concat → 1x1 linear projection back to the trunk width →
    ``x + scale * branch`` with a trailing ReLU."""

    features: int
    scale: float = 0.17
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        f = max(self.features // 8, 16)
        b1 = ConvNormAct(f, kernel=1, dtype=self.dtype, norm_type=self.norm_type)(x)
        b2 = ConvNormAct(f, kernel=1, dtype=self.dtype, norm_type=self.norm_type)(x)
        b2 = ConvNormAct(f, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(b2)
        b3 = ConvNormAct(f, kernel=1, dtype=self.dtype, norm_type=self.norm_type)(x)
        b3 = ConvNormAct(f * 3 // 2, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(b3)
        b3 = ConvNormAct(f * 2, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(b3)
        mixed = jnp.concatenate([b1, b2, b3], axis=-1)
        up = ConvNormAct(self.features, kernel=1, act=False,
                         dtype=self.dtype, norm_type=self.norm_type)(mixed)
        return nn.relu(x + jnp.asarray(self.scale, self.dtype) * up)


class InceptionResNetV2(nn.Module):
    """Inception-ResNet-v2 as a 4-stage encoder — the last reference
    modelzoo entry (``unet_baseline/models/modelzoo/inceptionresnetv2.py``,
    stem :276-296, repeated scaled-residual blocks :299-320 with the
    canonical 0.17/0.10/0.20 branch scales, reductions between stages).
    Stage widths follow the reference trunk (320/1088/2080 after the
    reductions) with a light /4 stage prepended so the encoder exposes the
    same /4 /8 /16 /32 contract as every other backbone here."""

    stage_features: Sequence[int] = (128, 320, 1088, 2080)
    blocks_per_stage: Sequence[int] = (1, 2, 4, 2)
    block_scales: Sequence[float] = (0.17, 0.17, 0.10, 0.20)
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        # Stem (conv2d_1a..4a): two /2 steps to /4 overall.
        x = ConvNormAct(32, kernel=3, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        x = ConvNormAct(32, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(x)
        x = ConvNormAct(64, kernel=3, dtype=self.dtype, norm_type=self.norm_type)(x)
        feats = []
        for f, n, s in zip(self.stage_features, self.blocks_per_stage, self.block_scales):
            x = ConvNormAct(f, kernel=3, strides=2, dtype=self.dtype,
                            norm_type=self.norm_type)(x)  # reduction
            for _ in range(n):
                x = InceptionResBlock(f, scale=s, dtype=self.dtype,
                                      norm_type=self.norm_type)(x)
            feats.append(x)
        return tuple(feats)


register_backbone("xception", lambda **kw: Xception(**kw))
register_backbone("inception_v4", lambda **kw: InceptionV4(**kw))
register_backbone("inceptionresnetv2", lambda **kw: InceptionResNetV2(**kw))
