"""Fold trained BatchNorm statistics into conv kernels for inference.

The reference's models run BatchNorm, which disappears into the preceding
conv at inference (scale/shift are constants once running stats freeze) —
the ~15-25% inference win GroupNorm cannot give (it normalizes per-sample
activations). This module converts a ``norm_type="batch"`` checkpoint
(params + batch_stats) into the parameter tree of the SAME model built with
``norm_type="folded"`` (conv with bias, no norm op), function-preserving
for eval-mode outputs:

    y = gamma * (conv(x) - mean) / sqrt(var + eps) + beta
      = conv'(x) + bias'      with  kernel' = kernel * s, bias' = beta - mean * s,
                                    s = gamma / sqrt(var + eps)

Reference being replaced: torch BN eval semantics in every backbone
(``unet_baseline/models/modelzoo``), exploited implicitly by cudnn fusion.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fold_batch_norms"]

_EPS = 1e-5  # flax nn.BatchNorm default


def _fold_node(params_node, stats_node):
    """Fold every (Conv_0, BatchNorm_0) sibling pair under this node."""
    out = {}
    for key, val in params_node.items():
        if not isinstance(val, dict):
            out[key] = val
            continue
        if "Conv_0" in val and "BatchNorm_0" in val:
            conv = dict(val["Conv_0"])
            bn = val["BatchNorm_0"]
            st = stats_node[key]["BatchNorm_0"]
            s = bn["scale"] / jnp.sqrt(st["var"] + _EPS)
            kernel = conv["kernel"] * s  # broadcast over the output dim
            bias = bn["bias"] - st["mean"] * s
            if "bias" in conv:  # conv had a bias (norm=False elsewhere)
                bias = bias + conv["bias"] * s
            folded = dict(val)
            folded["Conv_0"] = {"kernel": kernel, "bias": bias}
            del folded["BatchNorm_0"]
            # recurse into any other children (e.g. nested submodules)
            out[key] = _fold_node(
                folded, stats_node.get(key, {})
            )
        else:
            out[key] = _fold_node(val, stats_node.get(key, {}))
    return out


def fold_batch_norms(variables):
    """``{"params": ..., "batch_stats": ...}`` of a ``norm_type="batch"``
    model → ``{"params": ...}`` for the same model with
    ``norm_type="folded"``. Eval outputs are bit-for-bit equal up to float
    re-association."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return {"params": _fold_node(params, stats)}
