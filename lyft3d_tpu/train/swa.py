"""Stochastic weight averaging + checkpoint ensembling utilities.

Capability of the reference's SWA stack
(``deeplab_v3_baseline/tuils/swa_utils.py``: ``moving_average:15`` running
param mean, ``swa:159`` checkpoint-file averaging; ``bn_update:48`` exists
upstream to refresh BatchNorm running stats — unnecessary here because every
model uses GroupNorm/LayerNorm, which have no running stats) and the 5-model
logit-mean ensembling pattern (``ensemble_5_model.py:41-52`` — realized at
inference time by ``pipelines.bev.make_infer_fn`` taking N model/param
pairs).
"""

from __future__ import annotations

from typing import Sequence

import jax

from lyft3d_tpu.train import checkpoint as ckpt

__all__ = ["moving_average", "average_params", "swa_from_checkpoints"]


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
