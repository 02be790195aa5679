"""Model families (flax/linen, NHWC, bfloat16 compute / float32 params).

Registry-based construction mirrors the reference's per-name dispatch
(``unet_baseline/models/unet.py:26-192`` backbone switch,
SECOND's ``register_voxelnet/vfe/middle/rpn`` registries).
"""

from lyft3d_tpu.models.registry import build_model, register_model, list_models

__all__ = ["build_model", "register_model", "list_models"]
