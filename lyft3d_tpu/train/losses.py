"""Loss functions (pure jnp).

Capability of the reference's loss zoo:
- weighted CE + SIZE·BCE + SoftDice BEV segmentation loss
  (``unet-training-with-map.py:364-369`` + ``models/model.py:31-41``,
  ``models/utils.py:65`` SoftDiceLoss);
- sigmoid focal classification loss, weighted smooth-L1 localization loss,
  weighted softmax CE (``second/second/pytorch/core/losses.py:135-358``);
- PointRCNN's DiceLoss / focal (``lib/utils/loss_utils.py:7-86``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "weighted_softmax_ce",
    "soft_dice_loss",
    "bce_with_logits",
    "bev_segmentation_loss",
    "sigmoid_focal_loss",
    "smooth_l1",
    "weighted_smooth_l1",
]


def weighted_softmax_ce(logits, labels, class_weights=None):
    """Mean softmax cross-entropy with per-class weights.

    Args:
        logits: (..., C); labels: (...) int; class_weights: (C,) or None.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is None:
        return -jnp.mean(ll)
    wts = jnp.asarray(class_weights)[labels]
    return -jnp.sum(ll * wts) / jnp.maximum(jnp.sum(wts), 1e-12)


def bce_with_logits(logits, targets, weights=None):
    """Mean binary cross-entropy on logits (numerically stable)."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weights is not None:
        loss = loss * weights
    return jnp.mean(loss)


def soft_dice_loss(logits, targets_onehot, eps: float = 1.0, skip_background: bool = True):
    """1 − mean soft Dice over (batch, class) on sigmoid probabilities
    (models/utils.py:65-79 semantics)."""
    probs = jax.nn.sigmoid(logits)
    if skip_background:
        probs = probs[..., 1:]
        targets_onehot = targets_onehot[..., 1:]
    axes = tuple(range(1, probs.ndim - 1))
    inter = jnp.sum(probs * targets_onehot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(targets_onehot, axis=axes)
    dice = (2.0 * inter + eps) / (denom + eps)
    return 1.0 - jnp.mean(dice)


def bev_segmentation_loss(
    logits,
    aux_logits,
    labels,
    class_weights=None,
    size_weight: float = 336.0,
):
    """The reference UNet training objective:
    weighted CE + SIZE·BCE(one-hot) + SoftDice, plus BCE on the auxiliary
    image-level head against per-image class presence.

    Returns (total, dict of components).
    """
    n_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n_classes, dtype=logits.dtype)
    ce = weighted_softmax_ce(logits, labels, class_weights)
    bce = bce_with_logits(logits, onehot)
    dice = soft_dice_loss(logits, onehot)
    present = (jnp.max(onehot, axis=tuple(range(1, onehot.ndim - 1))) > 0).astype(
        logits.dtype
    )
    aux = bce_with_logits(aux_logits, present)
    total = ce + size_weight * bce + dice + aux
    return total, {"ce": ce, "bce": bce, "dice": dice, "aux": aux}


def sigmoid_focal_loss(logits, targets_onehot, alpha: float = 0.25, gamma: float = 2.0,
                       weights=None):
    """Per-element sigmoid focal loss (losses.py:236 semantics); caller
    normalizes (SECOND divides by positives)."""
    p = jax.nn.sigmoid(logits)
    ce = (
        jnp.maximum(logits, 0)
        - logits * targets_onehot
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    a_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    loss = a_t * jnp.power(1.0 - p_t, gamma) * ce
    if weights is not None:
        loss = loss * weights
    return loss


def smooth_l1(diff, sigma: float = 3.0):
    """Per-element smooth L1 (Huber) with SECOND's sigma parameterization."""
    s2 = sigma * sigma
    absd = jnp.abs(diff)
    return jnp.where(absd < 1.0 / s2, 0.5 * s2 * diff * diff, absd - 0.5 / s2)


def weighted_smooth_l1(pred, target, weights=None, sigma: float = 3.0, code_weights=None):
    """(…, D) box-regression loss, optional per-dim and per-anchor weights
    (losses.py:135 WeightedSmoothL1LocalizationLoss)."""
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights)
    loss = smooth_l1(diff, sigma).sum(axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss
