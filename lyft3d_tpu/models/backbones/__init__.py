"""Encoder backbones returning 4 feature stages (/4, /8, /16, /32, NHWC).

Capability of the reference's pretrained model zoo
(``unet_baseline/models/modelzoo/``: senet/se_resnext, resnet, dpn,
efficientnet) — rebuilt as flax modules. No ImageNet weights are shipped
(the reference pulls torch hub URLs; this environment is zero-egress), so
stems natively accept arbitrary input channels (the reference instead grafts
6-channel stems onto 3-channel pretrained weights, unet.py:35-51).

``norm_type`` ("group" | "batch" | "folded", see ``layers.ConvNormAct``) is
threaded through the seresnext / resnet / wide_resnet / dpn trunks; the
xception / inception / efficientnet families keep GroupNorm inside their
separable/MBConv blocks (no torch importer exists for them, so the
function-preserving-BN path does not apply).
"""

from lyft3d_tpu.models.backbones.resnet import ResNet, resnet18, resnet34, resnet50
from lyft3d_tpu.models.backbones.seresnext import (
    SEResNeXt,
    seresnext26,
    seresnext50,
    seresnext101,
)

BACKBONES = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "seresnext26": seresnext26,
    "seresnext50": seresnext50,
    "seresnext101": seresnext101,
}


def register_backbone(name, fn):
    BACKBONES[name] = fn


def build_backbone(name: str, **kwargs):
    # Lazy imports register the heavier families on demand.
    if name.startswith("efficientnet"):
        import lyft3d_tpu.models.backbones.efficientnet  # noqa: F401
    if name.startswith("dpn"):
        import lyft3d_tpu.models.backbones.dpn  # noqa: F401
    if name.startswith("wide_resnet"):
        import lyft3d_tpu.models.backbones.wide_resnet  # noqa: F401
    if name.startswith(("xception", "inception")):
        import lyft3d_tpu.models.backbones.xception  # noqa: F401
    return BACKBONES[name](**kwargs)
