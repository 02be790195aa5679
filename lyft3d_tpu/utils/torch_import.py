"""Torch-checkpoint → flax-params importer for the backbone zoo.

Restores the reference's transfer-learning capability (the reference pulls
ImageNet weights from torch hub into its modelzoo encoders,
``unet_baseline/models/modelzoo/senet.py:436-458`` /
``modelzoo/resnet.py``) in a zero-egress world: given a torch
``state_dict`` the *user* already has on disk (e.g. the hub file the
reference downloads), map it onto this framework's flax backbones.

Conversion rules
----------------
- Conv kernels: torch OIHW → flax HWIO (grouped convs keep the same
  transpose — torch ``(O, I/g, kh, kw)`` → flax ``(kh, kw, I/g, O)``).
- Linear: torch ``(out, in)`` → flax ``(in, out)``.
- BatchNorm → GroupNorm: running stats are *folded* into the affine pair
  (``scale = γ/√(var+ε)``, ``bias = β − mean·scale``). GroupNorm
  re-normalizes activations, so this is an **initialization transfer**
  (what fine-tuning needs), not a function-preserving conversion — the
  same trade the reference makes when it grafts a 6-channel stem onto
  3-channel pretrained weights (``models/unet.py:35-51``).
- Input-channel inflation: a 3-channel stem kernel is tiled to the target
  channel count and rescaled by ``3/C_in`` so pre-activation magnitudes
  are preserved (standard 2-frame/6-channel inflation trick).

Supported torch layouts:
- SE-ResNeXt (Cadene ``pretrainedmodels`` senet layout — what the
  reference's ``modelzoo/senet.py`` is): ``layer0.conv1/bn1``,
  ``layer{1..4}.{i}.conv{1,2,3}/bn{1,2,3}``, ``se_module.fc{1,2}``
  (1x1 convs), ``downsample.{0,1}``.
- ResNet (torchvision layout): ``conv1/bn1``,
  ``layer{1..4}.{i}.conv{1,2[,3]}/bn{1,2[,3]}``, ``downsample.{0,1}``.
- EfficientNet (efficientnet-pytorch layout — what the reference's
  ``modelzoo/efficientNet.py`` is): ``_conv_stem/_bn0``,
  ``_blocks.{i}._expand_conv/_bn0, _depthwise_conv/_bn1,
  _se_reduce/_se_expand, _project_conv/_bn2``.

NOT supported: dpn (the flax trunk is a generic dual-path capability
re-implementation whose widths differ from Cadene dpn68 — nearly every
tensor would shape-skip), and the compacted xception/inception trunks
(structurally impossible; see docs/PARITY.md).

Classifier heads (``last_linear`` / ``fc``) are dropped — the detector
heads are task-specific.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

import numpy as np

BN_EPS = 1e-5


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a flat {name: np.ndarray} dict.

    Handles the common nestings the reference strips by hand: a
    ``state_dict`` wrapper key and ``module.`` DataParallel prefixes
    (``unet-inference-with-map.py:568-586``).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return normalize_state_dict(obj)


def normalize_state_dict(obj: Any) -> Dict[str, np.ndarray]:
    """Unwrap/strip a loaded torch checkpoint object to flat numpy arrays."""
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, Mapping) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, Mapping) and "model_state" in obj:  # torchplus ckpt
        obj = obj["model_state"]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """Torch conv weight OIHW → flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """Torch linear weight (out, in) → flax (in, out).

    1x1-conv SE gates (senet.py SEModule fc1/fc2 are Conv2d) are squeezed
    to dense form first.
    """
    if w.ndim == 4:  # (O, I, 1, 1) 1x1 conv used as a linear layer
        w = w[:, :, 0, 0]
    return np.transpose(w, (1, 0))


def fold_bn(sd: Mapping[str, np.ndarray], prefix: str, eps: float = BN_EPS):
    """Fold BN running stats into a (scale, bias) affine pair for GroupNorm."""
    gamma = sd[prefix + ".weight"].astype(np.float32)
    beta = sd[prefix + ".bias"].astype(np.float32)
    mean = sd[prefix + ".running_mean"].astype(np.float32)
    var = sd[prefix + ".running_var"].astype(np.float32)
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def inflate_input_channels(kernel: np.ndarray, in_channels: int) -> np.ndarray:
    """Tile an HWIO stem kernel's input channels to ``in_channels``.

    Rescales by ``orig/in_channels`` so the expected pre-activation
    magnitude is unchanged when the extra channels carry similar data.
    """
    orig = kernel.shape[2]
    if orig == in_channels:
        return kernel
    reps = -(-in_channels // orig)  # ceil
    tiled = np.tile(kernel, (1, 1, reps, 1))[:, :, :in_channels, :]
    return tiled * (orig / in_channels)


def _conv_norm_act(sd, conv_name: str, bn_name: str,
                   in_channels: int | None = None, norm_type: str = "group"):
    """ConvNormAct subtree from torch conv+bn tensors.

    norm_type="group": BN stats folded into the GroupNorm affine
    (initialization transfer — GN re-normalizes, see module docstring).
    norm_type="batch": FUNCTION-PRESERVING — γ/β go to the flax BatchNorm
    params and running mean/var ride along under the reserved
    ``__batch_stats__`` key (split into the batch_stats collection by
    :func:`split_batch_stats`).
    """
    kernel = conv_kernel(sd[conv_name + ".weight"])
    if in_channels is not None:
        kernel = inflate_input_channels(kernel, in_channels)
    if norm_type == "batch":
        return {
            "Conv_0": {"kernel": kernel},
            "BatchNorm_0": {
                "scale": sd[bn_name + ".weight"].astype(np.float32),
                "bias": sd[bn_name + ".bias"].astype(np.float32),
                "__batch_stats__": {
                    "mean": sd[bn_name + ".running_mean"].astype(np.float32),
                    "var": sd[bn_name + ".running_var"].astype(np.float32),
                },
            },
        }
    return {
        "Conv_0": {"kernel": kernel},
        "GroupNorm_0": fold_bn(sd, bn_name),
    }


def split_batch_stats(tree):
    """Split a converted tree into (params, batch_stats) by extracting the
    reserved ``__batch_stats__`` nodes (mirroring the tree structure)."""
    params, stats = {}, {}
    for k, v in tree.items():
        if not isinstance(v, dict):
            params[k] = v
            continue
        if "__batch_stats__" in v:
            rest = {kk: vv for kk, vv in v.items() if kk != "__batch_stats__"}
            p, s = split_batch_stats(rest)
            params[k] = p
            stats[k] = dict(v["__batch_stats__"], **s) if s else v["__batch_stats__"]
        else:
            p, s = split_batch_stats(v)
            params[k] = p
            if s:
                stats[k] = s
    return params, stats


def seresnext_params_from_torch(
    sd: Mapping[str, np.ndarray],
    stage_sizes: Sequence[int] = (3, 4, 23, 3),
    in_channels: int = 6,
    norm_type: str = "group",
) -> Dict[str, Any]:
    """Map a Cadene-senet state_dict onto the ``SEResNeXt`` flax subtree."""
    cna = lambda *a, **kw: _conv_norm_act(sd, *a, norm_type=norm_type, **kw)
    tree: Dict[str, Any] = {
        "ConvNormAct_0": cna("layer0.conv1", "layer0.bn1", in_channels)
    }
    block_idx = 0
    for si, n_blocks in enumerate(stage_sizes):
        for bi in range(n_blocks):
            p = f"layer{si + 1}.{bi}"
            if p + ".conv1.weight" not in sd:
                # Shallower torch checkpoint: leave this block at its flax
                # init (reference load_pretrain skip semantics).
                block_idx += 1
                continue
            blk: Dict[str, Any] = {
                "ConvNormAct_0": cna(p + ".conv1", p + ".bn1"),
                "ConvNormAct_1": cna(p + ".conv2", p + ".bn2"),
                "ConvNormAct_2": cna(p + ".conv3", p + ".bn3"),
                "SEModule_0": {
                    "Dense_0": {
                        "kernel": dense_kernel(sd[p + ".se_module.fc1.weight"]),
                        "bias": sd[p + ".se_module.fc1.bias"],
                    },
                    "Dense_1": {
                        "kernel": dense_kernel(sd[p + ".se_module.fc2.weight"]),
                        "bias": sd[p + ".se_module.fc2.bias"],
                    },
                },
            }
            if p + ".downsample.0.weight" in sd:
                blk["ConvNormAct_3"] = cna(p + ".downsample.0", p + ".downsample.1")
            tree[f"SEResNeXtBlock_{block_idx}"] = blk
            block_idx += 1
    return tree


def resnet_params_from_torch(
    sd: Mapping[str, np.ndarray],
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    bottleneck: bool = False,
    in_channels: int = 6,
    norm_type: str = "group",
) -> Dict[str, Any]:
    """Map a torchvision-resnet state_dict onto the ``ResNet`` flax subtree."""
    cna = lambda *a, **kw: _conv_norm_act(sd, *a, norm_type=norm_type, **kw)
    tree: Dict[str, Any] = {
        "ConvNormAct_0": cna("conv1", "bn1", in_channels)
    }
    n_convs = 3 if bottleneck else 2
    block_cls = "Bottleneck" if bottleneck else "BasicBlock"
    block_idx = 0
    for si, n_blocks in enumerate(stage_sizes):
        for bi in range(n_blocks):
            p = f"layer{si + 1}.{bi}"
            if p + ".conv1.weight" not in sd:
                block_idx += 1
                continue
            blk: Dict[str, Any] = {}
            for ci in range(n_convs):
                blk[f"ConvNormAct_{ci}"] = cna(f"{p}.conv{ci + 1}", f"{p}.bn{ci + 1}")
            if p + ".downsample.0.weight" in sd:
                blk[f"ConvNormAct_{n_convs}"] = cna(
                    p + ".downsample.0", p + ".downsample.1"
                )
            tree[f"{block_cls}_{block_idx}"] = blk
            block_idx += 1
    return tree


def efficientnet_params_from_torch(
    sd: Mapping[str, np.ndarray],
    variant: str = "b0",
    in_channels: int = 6,
    norm_type: str = "group",
) -> Dict[str, Any]:
    """Map an efficientnet-pytorch state_dict onto the ``EfficientNet``
    flax subtree.

    The reference's ``modelzoo/efficientNet.py`` IS this layout
    (``_conv_stem``/``_bn0``, ``_blocks.{i}._expand_conv/_depthwise_conv/
    _project_conv`` + ``_bn0/1/2`` + ``_se_reduce/_se_expand``), and the
    flax ``EfficientNet`` flattens its MBConv blocks in the same compound-
    scaled order, so the mapping is 1:1 per block."""
    from lyft3d_tpu.models.backbones.efficientnet import (
        _BASE_BLOCKS,
        _SCALING,
        _round_repeats,
    )

    cna = lambda *a, **kw: _conv_norm_act(sd, *a, norm_type=norm_type, **kw)
    tree: Dict[str, Any] = {
        "ConvNormAct_0": cna("_conv_stem", "_bn0", in_channels)
    }
    _, dm = _SCALING[variant]
    bi = 0
    for expand, _ch, reps, _stride, _k in _BASE_BLOCKS:
        for _ in range(_round_repeats(reps, dm)):
            p = f"_blocks.{bi}"
            if p + "._depthwise_conv.weight" not in sd:
                bi += 1  # shallower checkpoint: keep flax init
                continue
            blk: Dict[str, Any] = {}
            ci = 0
            if expand != 1:
                blk[f"ConvNormAct_{ci}"] = cna(p + "._expand_conv",
                                               p + "._bn0")
                ci += 1
            blk[f"ConvNormAct_{ci}"] = cna(p + "._depthwise_conv",
                                           p + "._bn1")
            ci += 1
            blk["Dense_0"] = {
                "kernel": dense_kernel(sd[p + "._se_reduce.weight"]),
                "bias": sd[p + "._se_reduce.bias"],
            }
            blk["Dense_1"] = {
                "kernel": dense_kernel(sd[p + "._se_expand.weight"]),
                "bias": sd[p + "._se_expand.bias"],
            }
            blk[f"ConvNormAct_{ci}"] = cna(p + "._project_conv", p + "._bn2")
            tree[f"MBConv_{bi}"] = blk
            bi += 1
    return tree


_BACKBONE_SPECS = {
    "seresnext26": ("SEResNeXt_0", seresnext_params_from_torch, {"stage_sizes": (2, 2, 2, 2)}),
    "seresnext50": ("SEResNeXt_0", seresnext_params_from_torch, {"stage_sizes": (3, 4, 6, 3)}),
    "seresnext101": ("SEResNeXt_0", seresnext_params_from_torch, {"stage_sizes": (3, 4, 23, 3)}),
    "resnet18": ("ResNet_0", resnet_params_from_torch, {"stage_sizes": (2, 2, 2, 2)}),
    "resnet34": ("ResNet_0", resnet_params_from_torch, {"stage_sizes": (3, 4, 6, 3)}),
    "resnet50": (
        "ResNet_0",
        resnet_params_from_torch,
        {"stage_sizes": (3, 4, 6, 3), "bottleneck": True},
    ),
    **{
        f"efficientnet_{v}": (
            "EfficientNet_0", efficientnet_params_from_torch, {"variant": v},
        )
        for v in ("b0", "b1", "b2", "b3", "b4", "b5")
    },
}


def _merge(dst: Dict[str, Any], src: Mapping[str, Any], path: str, report: list):
    """Shape-checked recursive merge (reference filter_param_dict semantics,
    second/pytorch/train.py:117-206 / models/model.py:50-60): matching
    shapes are replaced, mismatches and unknown keys are skipped+reported."""
    for k, v in src.items():
        where = f"{path}/{k}"
        if k not in dst:
            report.append(("missing", where))
            continue
        if isinstance(v, Mapping):
            _merge(dst[k], v, where, report)
        else:
            cur = dst[k]
            if tuple(np.shape(cur)) != tuple(np.shape(v)):
                report.append(("shape", where))
                continue
            dst[k] = np.asarray(v, dtype=np.asarray(cur).dtype)
            report.append(("loaded", where))


def load_pretrained_backbone(
    params: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray],
    backbone: str,
    in_channels: int = 6,
    verbose: bool = False,
    norm_type: str = "group",
):
    """Return a copy of a model's params with the named backbone's subtree
    replaced by converted torch weights.

    ``params`` is the full flax variables dict (``{"params": {...}}``) of a
    model built around one of the zoo backbones (e.g. ``unet_seresnext101``).
    Partial-load semantics match the reference's ``load_pretrain``: only
    shape-matching leaves are replaced.

    With ``norm_type="batch"`` (the model built with the same option) the
    conversion is FUNCTION-PRESERVING: BN γ/β load into the flax BatchNorm
    params and running mean/var into the ``batch_stats`` collection.
    """
    import jax
    from flax.core import unfreeze

    if backbone not in _BACKBONE_SPECS:
        raise KeyError(
            f"no torch importer for backbone {backbone!r}; "
            f"supported: {sorted(_BACKBONE_SPECS)}"
        )
    sub_name, fn, kw = _BACKBONE_SPECS[backbone]
    converted = fn(normalize_state_dict(state_dict), in_channels=in_channels,
                   norm_type=norm_type, **kw)
    converted, conv_stats = split_batch_stats(converted)

    def find(tree, name):
        if name in tree:
            return tree[name]
        for v in tree.values():
            if isinstance(v, Mapping):
                hit = find(v, name)
                if hit is not None:
                    return hit
        return None

    # Work on a mutable deep copy; locate the backbone subtree anywhere in
    # the model (LyftUNet nests it at the top of its scope).
    new_params = jax.tree_util.tree_map(np.asarray, unfreeze(params))
    target_top = new_params["params"] if "params" in new_params else new_params
    target = find(target_top, sub_name)
    if target is None:
        raise KeyError(f"backbone subtree {sub_name!r} not found in params")
    report: list = []
    _merge(target, converted, sub_name, report)
    if conv_stats and "batch_stats" in new_params:
        stats_target = find(new_params["batch_stats"], sub_name)
        if stats_target is None:
            raise KeyError(f"batch_stats subtree {sub_name!r} not found")
        _merge(stats_target, conv_stats, sub_name + ":stats", report)
    loaded = sum(1 for s, _ in report if s == "loaded")
    skipped = [w for s, w in report if s != "loaded"]
    if verbose or skipped:
        print(f"[torch_import] loaded {loaded} tensors, skipped {len(skipped)}")
        for w in skipped[:20]:
            print(f"[torch_import]   skipped {w}")
    return new_params
