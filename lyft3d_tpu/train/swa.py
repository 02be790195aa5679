"""Stochastic weight averaging + checkpoint ensembling utilities.

Capability of the reference's SWA stack
(``deeplab_v3_baseline/tuils/swa_utils.py``: ``moving_average:15`` running
param mean, ``swa:159`` checkpoint-file averaging, ``bn_update:48``
BatchNorm running-stats refresh after averaging — needed only for models
built with ``norm_type="batch"``; GroupNorm/LayerNorm models have no
running stats) and the 5-model logit-mean ensembling pattern
(``ensemble_5_model.py:41-52`` — realized at inference time by
``pipelines.bev.make_infer_fn`` taking N model/param pairs).
"""

from __future__ import annotations

from typing import Sequence

import jax

from lyft3d_tpu.train import checkpoint as ckpt

__all__ = ["moving_average", "average_params", "swa_from_checkpoints",
           "bn_update"]


def moving_average(avg_params, new_params, n: int):
    """Running mean update: avg ← avg + (new − avg)/(n+1) (swa_utils.py:15)."""
    return jax.tree_util.tree_map(
        lambda a, p: a + (p - a) / float(n + 1), avg_params, new_params
    )


def average_params(params_list: Sequence):
    """Uniform average of parameter pytrees (the swa() file-average)."""
    assert params_list
    out = params_list[0]
    for n, p in enumerate(params_list[1:], start=1):
        out = moving_average(out, p, n)
    return out


def swa_from_checkpoints(paths, template):
    """Average the ``params`` field of several saved train states."""
    states = [ckpt.restore(p, template) for p in paths]
    return average_params([s.params if hasattr(s, "params") else s["params"] for s in states])


def bn_update(model, variables, batches, apply_fn=None):
    """Recompute BatchNorm running stats for averaged weights
    (swa_utils.py:48 ``bn_update``): exact dataset mean/variance over the
    given batches, written into the ``batch_stats`` collection.

    Only meaningful for models built with ``norm_type="batch"``; a
    no-batch_stats variables dict is returned unchanged.

    Args:
        model: flax module whose ``apply`` accepts the batch as its input.
        variables: {"params": ..., "batch_stats": ...} (e.g. SWA-averaged
            params with stale stats).
        batches: iterable of model inputs (each one batch).
        apply_fn: optional ``fn(variables, batch, mutable)`` override for
            models with non-trivial signatures.
    """
    if "batch_stats" not in variables:
        return variables
    import jax.numpy as jnp

    apply_fn = apply_fn or (
        lambda v, b, mutable: model.apply(v, b, mutable=mutable)[1]
    )
    # Exact streaming mean over batches: after each forward pass flax's EMA
    # gives new = m*old + (1-m)*batch_stat; instead accumulate batch stats
    # directly by rescaling the EMA contribution out.
    sums = None
    n = 0
    for batch in batches:
        state = apply_fn(variables, batch, ["batch_stats"])
        # extract the *batch* statistic: new_ema = m*old + (1-m)*batch
        m = 0.99  # flax BatchNorm default momentum
        batch_stat = jax.tree_util.tree_map(
            lambda new, old: (new - m * old) / (1.0 - m),
            state["batch_stats"], variables["batch_stats"],
        )
        sums = batch_stat if sums is None else jax.tree_util.tree_map(
            jnp.add, sums, batch_stat
        )
        n += 1
    if n == 0:
        return variables
    fresh = jax.tree_util.tree_map(lambda s: s / n, sums)
    return dict(variables, batch_stats=fresh)
