"""Stateful running classification metrics, as functional pytree counters.

Capability of ``second/torchplus/metrics.py`` (Accuracy:27, Precision:76,
Recall:126, PrecisionRecall:195 — nn.Modules holding running counts at
multiple thresholds, updated per step, cleared per epoch) — here the state
is an explicit pytree threaded through the jitted step, so it shards and
checkpoints like everything else.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

__all__ = ["prec_recall_init", "prec_recall_update", "prec_recall_compute",
           "accuracy_init", "accuracy_update", "accuracy_compute"]


def prec_recall_init(thresholds: Sequence[float]) -> Dict[str, jnp.ndarray]:
    k = len(thresholds)
    return {
        "thresholds": jnp.asarray(thresholds, jnp.float32),
        "tp": jnp.zeros(k, jnp.float32),
        "fp": jnp.zeros(k, jnp.float32),
        "fn": jnp.zeros(k, jnp.float32),
    }


def prec_recall_update(state, scores, labels, weights=None):
    """scores: (...,) predicted foreground probability; labels: (...,) 0/1."""
    scores = scores.reshape(-1)
    labels = labels.reshape(-1).astype(jnp.float32)
    w = jnp.ones_like(scores) if weights is None else weights.reshape(-1)
    thr = state["thresholds"][:, None]
    pred = (scores[None, :] > thr).astype(jnp.float32)
    tp = jnp.sum(pred * labels[None, :] * w, axis=1)
    fp = jnp.sum(pred * (1 - labels)[None, :] * w, axis=1)
    fn = jnp.sum((1 - pred) * labels[None, :] * w, axis=1)
    return {
        "thresholds": state["thresholds"],
        "tp": state["tp"] + tp,
        "fp": state["fp"] + fp,
        "fn": state["fn"] + fn,
    }


def prec_recall_compute(state) -> Tuple[jnp.ndarray, jnp.ndarray]:
    prec = state["tp"] / jnp.maximum(state["tp"] + state["fp"], 1.0)
    rec = state["tp"] / jnp.maximum(state["tp"] + state["fn"], 1.0)
    return prec, rec


def accuracy_init() -> Dict[str, jnp.ndarray]:
    return {"correct": jnp.zeros((), jnp.float32), "total": jnp.zeros((), jnp.float32)}


def accuracy_update(state, preds, labels, weights=None):
    ok = (preds.reshape(-1) == labels.reshape(-1)).astype(jnp.float32)
    w = jnp.ones_like(ok) if weights is None else weights.reshape(-1)
    return {
        "correct": state["correct"] + jnp.sum(ok * w),
        "total": state["total"] + jnp.sum(w),
    }


def accuracy_compute(state) -> jnp.ndarray:
    return state["correct"] / jnp.maximum(state["total"], 1.0)
