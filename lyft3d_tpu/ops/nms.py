"""Greedy NMS on device (jnp, static shapes, fori_loop suppression sweep).

TPU-native replacement for the reference's bitmask CUDA NMS
(``iou3d.cpp:73-120`` ``nms_gpu``), the numba-CUDA ``rotate_nms_kernel``
(``second/second/core/non_max_suppression/nms_gpu.py:405``) and the numba-CPU
``nms_cpu.py``. Strategy: precompute the (N, N) pairwise IoU matrix with the
vectorized polygon clipper, then run one sequential `lax.fori_loop` over the
score-sorted list carrying a suppression mask — the only irreducibly
sequential part, O(N) scalar steps over vectorized rows.

All functions take padded fixed-size inputs; invalid rows are masked with
``valid`` (or by setting their score to −inf).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lyft3d_tpu.ops.rotated_iou import rotated_iou_bev, standup_iou
from lyft3d_tpu.ops.box_ops import box_corners_2d, corners_to_standup_2d

__all__ = ["nms_mask_from_iou", "rotated_nms", "standup_nms", "select_top_k"]


def nms_mask_from_iou(iou, scores, iou_threshold, valid=None):
    """Greedy NMS keep-mask given a precomputed (N, N) IoU matrix.

    Args:
        iou: (N, N) pairwise IoU (symmetric).
        scores: (N,) detection scores (higher = better).
        iou_threshold: suppress j if IoU(i, j) > threshold for a kept i.
        valid: optional (N,) bool; invalid rows are never kept.

    Returns:
        (N,) bool keep mask in the original order.
    """
    n = scores.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    iou_s = iou[order][:, order]
    valid_s = valid[order]
    rank = jnp.arange(n)

    def body(i, state):
        suppressed, keep = state
        is_keep = jnp.logical_and(valid_s[i], jnp.logical_not(suppressed[i]))
        keep = keep.at[i].set(is_keep)
        newly = jnp.logical_and(iou_s[i] > iou_threshold, rank > i)
        suppressed = jnp.where(is_keep, jnp.logical_or(suppressed, newly), suppressed)
        return suppressed, keep

    suppressed0 = jnp.zeros((n,), dtype=bool)
    keep0 = jnp.zeros((n,), dtype=bool)
    _, keep_sorted = jax.lax.fori_loop(0, n, body, (suppressed0, keep0))
    return jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)


def rotated_nms(boxes_bev, scores, iou_threshold, valid=None):
    """Rotated NMS on (N, 5) ``[x, y, w, l, yaw]`` BEV boxes → (N,) keep mask.

    Capability of ``box_torch_ops.rotate_nms:492`` / ``iou3d nms_gpu``.
    """
    iou = rotated_iou_bev(boxes_bev, boxes_bev)
    return nms_mask_from_iou(iou, scores, iou_threshold, valid=valid)


def standup_nms(boxes_bev, scores, iou_threshold, valid=None):
    """Axis-aligned NMS on rotated boxes via their standup extents.

    The fast path of ``box_torch_ops.nms:454`` (used when
    ``use_rotate_nms=False`` in SECOND configs).
    """
    standup = corners_to_standup_2d(box_corners_2d(boxes_bev))
    iou = standup_iou(standup, standup)
    return nms_mask_from_iou(iou, scores, iou_threshold, valid=valid)


def select_top_k(keep_mask, scores, k):
    """Compact a keep mask to at most ``k`` indices, score-sorted.

    Returns:
        (idx, sel_valid): (k,) int32 indices into the original arrays (padded
        with 0) and a (k,) bool mask of which slots are real selections.
    """
    masked = jnp.where(keep_mask, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(masked, k)
    return idx.astype(jnp.int32), top_scores > -jnp.inf
