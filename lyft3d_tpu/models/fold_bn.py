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


def _fold_pair(linear, bn, st):
    """kernel' = kernel·s, bias' = beta − mean·s (+ old_bias·s)."""
    s = bn["scale"] / jnp.sqrt(st["var"] + _EPS)
    kernel = linear["kernel"] * s  # broadcast over the output dim
    bias = bn["bias"] - st["mean"] * s
    if "bias" in linear:  # the linear layer had a bias (norm=False elsewhere)
        bias = bias + linear["bias"] * s
    return {"kernel": kernel, "bias": bias}


def _fold_node(params_node, stats_node):
    """Fold every (Conv_i|Dense_i, BatchNorm_i) INDEX-MATCHED sibling pair
    under this node (flax auto-numbering pairs each norm with the linear
    layer that precedes it: ConvNormAct emits Conv_0/BatchNorm_0, SharedMLP
    Dense_0/BatchNorm_0, Dense_1/BatchNorm_1, ...), recursing into all
    other children."""
    node = {
        key: (_fold_node(val, stats_node.get(key, {}))
              if isinstance(val, dict) else val)
        for key, val in params_node.items()
    }
    for key in [k for k in node if k.startswith("BatchNorm_")]:
        idx = key.split("_", 1)[1]
        mate = next(
            (m for m in (f"Conv_{idx}", f"Dense_{idx}") if m in node), None
        )
        if mate is None or key not in stats_node:
            continue
        node[mate] = _fold_pair(node[mate], node[key], stats_node[key])
        del node[key]
    return node


def fold_batch_norms(variables):
    """``{"params": ..., "batch_stats": ...}`` of a ``norm_type="batch"``
    model → ``{"params": ...}`` for the same model with
    ``norm_type="folded"``. Eval outputs are bit-for-bit equal up to float
    re-association."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return {"params": _fold_node(params, stats)}
