"""Region proposal network over the dense BEV feature map (flax, NHWC).

Capability of ``second/second/pytorch/models/rpn.py`` (``RPNNoHeadBase:202``
downsample blocks + transpose-conv up branches concatenated; heads
``RPNBase:334-428``: 1x1 convs → box (7·A), cls (C·A), dir (2·A); ``RPNV2``
zero-pad stem :468).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.layers import ConvNormAct, resize_to


class RPN(nn.Module):
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (64, 128, 256)
    upsample_strides: Sequence[float] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (128, 128, 128)
    num_anchors_per_loc: int = 2
    num_classes: int = 1  # per-anchor class logits (encode_background=False)
    box_code_size: int = 7
    use_direction_classifier: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        ups = []
        out_hw = None
        for i, (n_layers, stride, filters, up_f) in enumerate(
            zip(self.layer_nums, self.layer_strides, self.num_filters, self.num_upsample_filters)
        ):
            x = ConvNormAct(filters, strides=stride, dtype=self.dtype)(x)
            for _ in range(n_layers):
                x = ConvNormAct(filters, dtype=self.dtype)(x)
            u = ConvNormAct(up_f, kernel=1, dtype=self.dtype)(x)
            if out_hw is None:
                h, w = x.shape[1:3]
                out_hw = (
                    int(h * self.upsample_strides[0]),
                    int(w * self.upsample_strides[0]),
                )
            ups.append(resize_to(u, out_hw))
        x = jnp.concatenate(ups, axis=-1)

        a = self.num_anchors_per_loc
        box = nn.Conv(a * self.box_code_size, (1, 1), dtype=jnp.float32)(x)
        cls = nn.Conv(a * self.num_classes, (1, 1), dtype=jnp.float32)(x)
        out = {"box": box, "cls": cls}
        if self.use_direction_classifier:
            out["dir"] = nn.Conv(a * 2, (1, 1), dtype=jnp.float32)(x)
        return out
