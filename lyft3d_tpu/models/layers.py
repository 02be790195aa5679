"""Shared flax building blocks: ConvNormAct, SE gate, ASPP, decoder UpBlock.

Capability of the reference's ``unet_baseline/models/utils.py`` (SEModule:43,
UpBlock:81) and ``models/Aspp.py`` (ASPP:31-70) — TPU-first choices:
NHWC layout, GroupNorm instead of BatchNorm (keeps the train step a pure
function — no mutable batch_stats collection), bfloat16 compute with float32
params, nearest/bilinear resize via ``jax.image``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def upsample2x(x: jnp.ndarray, method: str = "bilinear") -> jnp.ndarray:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method=method)


def resize_to(x: jnp.ndarray, hw: Tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, hw[0], hw[1], c), method=method)


class ConvNormAct(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    act: bool = True
    norm: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            padding="SAME",
            use_bias=not self.norm,
            dtype=self.dtype,
        )(x)
        if self.norm:
            x = nn.GroupNorm(
                num_groups=_num_groups(self.features), dtype=self.dtype
            )(x)
        if self.act:
            x = nn.relu(x)
        return x


def _num_groups(features: int) -> int:
    for g in (32, 16, 8, 4, 2, 1):
        if features % g == 0:
            return g
    return 1


class SEModule(nn.Module):
    """Squeeze-and-excitation channel gate (models/utils.py:43)."""

    reduction: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))  # (N, C)
        s = nn.Dense(max(c // self.reduction, 4), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (Aspp.py:31-70 / deepv3.py:35-92):
    1x1 + dilated 3x3 branches + global-pool branch → 1x1 projection."""

    features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        branches = [ConvNormAct(self.features, kernel=1, dtype=self.dtype)(x)]
        for r in self.rates:
            branches.append(
                ConvNormAct(self.features, kernel=3, dilation=r, dtype=self.dtype)(x)
            )
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvNormAct(self.features, kernel=1, dtype=self.dtype)(pooled)
        branches.append(jnp.broadcast_to(pooled, (n, h, w, self.features)))
        x = jnp.concatenate(branches, axis=-1)
        return ConvNormAct(self.features, kernel=1, dtype=self.dtype)(x)


class UpBlock(nn.Module):
    """Decoder stage: 2x upsample → concat skip → conv → SE gate
    (models/utils.py:81-106)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None):
        x = upsample2x(x)
        if skip is not None:
            if skip.shape[1:3] != x.shape[1:3]:
                x = resize_to(x, skip.shape[1:3])
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvNormAct(self.features, dtype=self.dtype)(x)
        x = ConvNormAct(self.features, dtype=self.dtype)(x)
        return SEModule(dtype=self.dtype)(x)
