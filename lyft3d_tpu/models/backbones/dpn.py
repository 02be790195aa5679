"""Dual-Path Network encoder (flax, NHWC).

Capability of modelzoo/dpn.py (DPN68 used by the reference's dpn68 UNet):
each block carries a residual path (summed) and a dense path (concatenated),
implemented with grouped 3x3 bottlenecks.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.backbones import register_backbone
from lyft3d_tpu.models.layers import ConvNormAct


class DualPathBlock(nn.Module):
    res_features: int  # residual-path width
    dense_inc: int  # dense-path growth per block
    groups: int = 32
    strides: int = 1
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, state):
        res, dense = state  # residual tensor, dense tensor (may be None)
        x = res if dense is None else jnp.concatenate([res, dense], axis=-1)
        inner = self.res_features // 2
        y = ConvNormAct(inner, kernel=1, dtype=self.dtype, norm_type=self.norm_type)(x)
        y = ConvNormAct(inner, strides=self.strides, groups=self.groups, dtype=self.dtype, norm_type=self.norm_type)(y)
        y = ConvNormAct(
            self.res_features + self.dense_inc, kernel=1, act=False, dtype=self.dtype, norm_type=self.norm_type
        )(y)
        y_res, y_dense = y[..., : self.res_features], y[..., self.res_features :]

        if res.shape[-1] != self.res_features or self.strides != 1:
            proj = ConvNormAct(
                self.res_features + self.dense_inc,
                kernel=1,
                strides=self.strides,
                act=False,
                dtype=self.dtype, norm_type=self.norm_type,
            )(x)
            res = proj[..., : self.res_features]
            dense = proj[..., self.res_features :]
        new_res = nn.relu(res + y_res)
        new_dense = y_dense if dense is None else jnp.concatenate([dense, y_dense], axis=-1)
        return new_res, new_dense


class DPN(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 12, 3)
    res_features: Sequence[int] = (64, 128, 256, 512)
    dense_inc: Sequence[int] = (16, 32, 32, 64)
    groups: int = 32
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = ConvNormAct(10 * self.groups // 32 + 54, kernel=3, strides=2, dtype=self.dtype, norm_type=self.norm_type)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        state = (x, None)
        for si, n_blocks in enumerate(self.stage_sizes):
            for bi in range(n_blocks):
                strides = 2 if (si > 0 and bi == 0) else 1
                state = DualPathBlock(
                    self.res_features[si],
                    self.dense_inc[si],
                    groups=self.groups,
                    strides=strides,
                    dtype=self.dtype, norm_type=self.norm_type,
                )(state)
            res, dense = state
            feats.append(jnp.concatenate([res, dense], axis=-1))
        return tuple(feats)


register_backbone("dpn68", lambda **kw: DPN(**kw))
register_backbone(
    "dpn92",
    lambda **kw: DPN(
        stage_sizes=(3, 4, 20, 3),
        res_features=(256, 512, 1024, 2048),
        dense_inc=(16, 32, 24, 128),
        **kw,
    ),
)
