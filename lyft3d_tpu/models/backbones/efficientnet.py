"""EfficientNet encoder (flax, NHWC).

Capability of modelzoo/efficientNet.py (MBConvBlock / EfficientNet:1-215)
used by the reference's efficientnet-b1/2/3/5 UNets: MBConv inverted
bottlenecks with depthwise convs, SE gates, SiLU, compound width/depth
scaling. Returns 4 feature stages (/4, /8, /16, /32).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.backbones import register_backbone
from lyft3d_tpu.models.layers import ConvNormAct

# (width_mult, depth_mult) per variant.
_SCALING = {
    "b0": (1.0, 1.0),
    "b1": (1.0, 1.1),
    "b2": (1.1, 1.2),
    "b3": (1.2, 1.4),
    "b4": (1.4, 1.8),
    "b5": (1.6, 2.2),
}

# (expand_ratio, channels, repeats, stride, kernel) base (b0) blocks.
_BASE_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def _round_filters(f: float, width_mult: float, divisor: int = 8) -> int:
    f *= width_mult
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


class MBConv(nn.Module):
    features: int
    expand: int
    kernel: int
    strides: int
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # Conv/norm pairs go through ConvNormAct (act=False; MBConv is SiLU,
        # not ReLU) so ``norm_type`` selects group/batch/folded uniformly and
        # fold_batch_norms finds its (Conv_0, BatchNorm_0) sibling pairs.
        cna = lambda f, **kw: ConvNormAct(
            f, act=False, norm_type=self.norm_type, dtype=self.dtype, **kw
        )
        inp = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.silu(cna(inp * self.expand, kernel=1)(h))
        mid = h.shape[-1]
        # Depthwise: keep the native grouped lowering (the supergroup pack's
        # 128x FLOP redundancy is not worth it at cin_g=1).
        h = nn.silu(
            cna(
                mid, kernel=self.kernel, strides=self.strides,
                groups=mid, pack_groups="never",
            )(h)
        )
        # SE with ratio 0.25 of the block input.
        se_dim = max(1, inp // 4)
        s = jnp.mean(h, axis=(1, 2))
        s = nn.silu(nn.Dense(se_dim, dtype=self.dtype)(s))
        s = nn.sigmoid(nn.Dense(mid, dtype=self.dtype)(s))
        h = h * s[:, None, None, :]
        h = cna(self.features, kernel=1)(h)
        if self.strides == 1 and inp == self.features:
            h = h + x
        return h


class EfficientNet(nn.Module):
    variant: str = "b0"
    norm_type: str = "group"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        wm, dm = _SCALING[self.variant]
        x = x.astype(self.dtype)
        stem = _round_filters(32, wm)
        x = nn.silu(
            ConvNormAct(
                stem, kernel=3, strides=2, act=False,
                norm_type=self.norm_type, dtype=self.dtype,
            )(x)
        )

        feats = []
        for expand, ch, reps, stride, k in _BASE_BLOCKS:
            f = _round_filters(ch, wm)
            for i in range(_round_repeats(reps, dm)):
                s = stride if i == 0 else 1
                if s == 2 and feats is not None:
                    feats.append(x)  # feature BEFORE each downsample past the stem
                x = MBConv(f, expand, k, s, norm_type=self.norm_type, dtype=self.dtype)(x)
        feats.append(x)
        # feats: [/2 (pre-/4 ds), /4, /8, /16, /32-final]; drop the /2 entry.
        return tuple(feats[1:])


for _v in ("b0", "b1", "b2", "b3", "b4", "b5"):
    register_backbone(
        f"efficientnet_{_v}",
        (lambda v: (lambda **kw: EfficientNet(variant=v, **kw)))(_v),
    )
