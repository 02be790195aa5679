"""Segmentation mask → rotated detection boxes, fully on device.

TPU reformulation of the reference's CPU post-processing chain
(``unet-inference-with-map.py:326-366``: background-probability threshold →
3x3-ellipse morphological opening → ``cv2.findContours`` →
``cv2.minAreaRect`` → per-class center-pixel scores):

1. threshold + opening — vectorized (ops.connected_components.morph_open);
2. components — min-label propagation with path compression;
3. oriented box per component — instead of rotating calipers, an exhaustive
   angle sweep: project the component's pixels onto K rotated frames, take
   the tightest axis-aligned extent (argmin area). Exact to the sweep
   resolution (90/K degrees), all MXU/VPU work;
4. per-class scores — bilinear read of each class's probability at the
   component centroid.

Everything is fixed-capacity: ``max_components`` boxes of up to
``max_pixels`` member pixels (larger components use a uniform subset — fine
for extent statistics).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from lyft3d_tpu.ops.connected_components import connected_components, morph_open

__all__ = ["mask_to_rotated_boxes", "extract_detections",
           "extract_detections_from_logits"]


def mask_to_rotated_boxes(
    fg,
    max_components: int = 64,
    max_pixels: int = 1024,
    n_angles: int = 90,
    min_pixels: int = 2,
    cc_sweeps: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Boolean (H, W) mask → up to ``max_components`` oriented boxes.

    Returns:
        boxes_px: (max_components, 5) [cx, cy, w, l, angle] in pixel coords.
        valid: (max_components,) bool.
        counts: (max_components,) pixel counts.
        centroids: (max_components, 2) (cx, cy) mean pixel coords.
    """
    h, w = fg.shape
    max_components = min(max_components, h * w)
    max_pixels = min(max_pixels, h * w)
    labels = connected_components(fg, sweeps=cc_sweeps)
    flat_labels = labels.reshape(-1)
    flat_idx = jnp.arange(h * w, dtype=jnp.int32)
    big = jnp.int32(h * w)

    # ONE global sort groups every component's pixels contiguously; the
    # pixel indices ride along as a co-sorted operand (no argsort + gather).
    # Everything else is derived from the sorted order — components in
    # ascending-label order ARE components in first-pixel order, and segment
    # ranks (cumsum of label-change flags) are non-decreasing, so segment
    # starts/ends come from a binary search over the rank array. No scatter:
    # a 113k-update `.at[slot].set` compaction was the measured hot spot
    # (~6 ms of the 8 ms extraction at batch 8 on v5e — TPU scatters
    # serialize per update).
    sorted_labels, order = jax.lax.sort((flat_labels, flat_idx), num_keys=1)
    is_fg = sorted_labels < big
    is_new = jnp.concatenate(
        [is_fg[:1], (sorted_labels[1:] != sorted_labels[:-1]) & is_fg[1:]]
    )
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # segment rank per position
    n_roots = jnp.sum(is_new.astype(jnp.int32))  # distinct fg components
    # Clamped rank is non-decreasing even past capacity / into background.
    rank_c = jnp.where(is_fg, jnp.minimum(rank, max_components), max_components)
    ks = jnp.arange(max_components, dtype=jnp.int32)
    starts = jnp.searchsorted(rank_c, ks).astype(jnp.int32)
    ends = jnp.searchsorted(rank_c, ks, side="right").astype(jnp.int32)
    root_valid = ks < n_roots
    counts = jnp.where(root_valid, ends - starts, 0)

    # Batched per-component geometry: ONE int gather pulls every component's
    # pixel window of the sort permutation (order[i] IS the pixel's flat
    # index), and both coordinates are arithmetic on it — TPU gathers cost
    # ~2 ms per 64x512 window set at batch 8, so one gather, not two.
    # The K-angle sweep is then a single dense projection + masked min/max
    # reduction — no vmapped dynamic slices (64 per-component slices with
    # (K, P) temps were the measured hot spot: ~6 ms of the 8 ms extraction).
    order_pad = jnp.concatenate([order, jnp.zeros((max_pixels,), jnp.int32)])
    seg = jnp.arange(max_pixels, dtype=jnp.int32)
    idx = starts[:, None] + seg[None, :]  # (C, P); starts ≤ h*w, pad covers P
    order_win = order_pad[idx]  # (C, P)
    c_all = (order_win % w).astype(jnp.float32) + 0.5
    r_all = (order_win // w).astype(jnp.float32) + 0.5
    weight = ((seg[None, :] < counts[:, None]) & root_valid[:, None]).astype(
        jnp.float32
    )  # (C, P)

    angles = jnp.arange(n_angles, dtype=jnp.float32) * (jnp.pi / 2.0 / n_angles)
    cos, sin = jnp.cos(angles), jnp.sin(angles)  # (K,)
    pts = jnp.stack([c_all, r_all], axis=-1)  # (C, P, 2)
    # rot columns: [u_k; v_k] for each angle → one (C, P, 2K) matmul.
    rot = jnp.concatenate(
        [jnp.stack([cos, sin]), jnp.stack([-sin, cos])], axis=1
    )  # (2, 2K)
    uv = jnp.einsum("cpi,ik->cpk", pts, rot)  # (C, P, 2K)
    big = 1e9
    inv = (1.0 - weight)[:, :, None] * big
    mn = jnp.min(uv + inv, axis=1)  # (C, 2K)
    mx = jnp.max(uv - inv, axis=1)
    u_min, v_min = mn[:, :n_angles], mn[:, n_angles:]
    u_max, v_max = mx[:, :n_angles], mx[:, n_angles:]
    # +1: a single pixel spans one cell (minAreaRect of a 1-px contour is
    # degenerate; pixel extent matches rasterization better).
    du = u_max - u_min + 1.0  # (C, K) extent along the angle axis
    dv = v_max - v_min + 1.0  # (C, K) perpendicular extent
    k = jnp.argmin(du * dv, axis=1)  # (C,)
    carange = jnp.arange(k.shape[0])
    ang = angles[k]
    cu = (u_min[carange, k] + u_max[carange, k]) / 2.0
    cv_ = (v_min[carange, k] + v_max[carange, k]) / 2.0
    cx = jnp.cos(ang) * cu - jnp.sin(ang) * cv_
    cy = jnp.sin(ang) * cu + jnp.cos(ang) * cv_
    boxes = jnp.stack(
        [cx, cy, dv[carange, k], du[carange, k], ang], axis=-1
    )  # w = perpendicular extent, l = along axis

    wsum = jnp.maximum(jnp.sum(weight, axis=1), 1.0)  # (C,)
    centroids = jnp.stack(
        [jnp.sum(c_all * weight, axis=1), jnp.sum(r_all * weight, axis=1)], axis=-1
    ) / wsum[:, None]
    valid = root_valid & (counts >= min_pixels)
    return boxes, valid, counts, centroids


def extract_detections(
    probs,
    bg_threshold: float = 80.0 / 255.0,
    class_score_threshold: float = 0.01,
    max_components: int = 64,
    max_pixels: int = 1024,
    n_angles: int = 90,
    open_iterations: int = 1,
):
    """Class-probability map → per-(component, class) detections.

    Mirrors the reference semantics: foreground = (1 − P(background))
    thresholded at ``bg_threshold`` then opened; each component yields one
    candidate box; every class whose probability at the component centroid
    exceeds ``class_score_threshold`` emits a detection with that score
    (``calc_detection_box`` loop, unet-inference-with-map.py:326-355).

    Args:
        probs: (H, W, C) softmax probabilities; channel 0 = background.

    Returns dict of fixed-shape arrays:
        boxes_px: (max_components, 5) [cx, cy, w, l, angle] (pixel units)
        box_valid: (max_components,)
        scores: (max_components, C−1) per-class centroid probabilities
        detect: (max_components, C−1) bool — emit this (box, class)?
    """
    h, w, c = probs.shape
    fg = (1.0 - probs[..., 0]) > bg_threshold
    return _finish_extraction(
        fg, lambda ri, ci: probs[ri, ci, 1:],
        class_score_threshold, max_components, max_pixels, n_angles,
        open_iterations,
    )


def extract_detections_from_logits(
    logits,
    bg_threshold: float = 80.0 / 255.0,
    class_score_threshold: float = 0.01,
    max_components: int = 64,
    max_pixels: int = 1024,
    n_angles: int = 90,
    open_iterations: int = 1,
):
    """:func:`extract_detections` taking raw LOGITS — the fused fast path.

    Numerically identical semantics, without materializing the (H, W, C)
    softmax: the foreground test ``1 − P(bg) > t`` is the logit-space test
    ``logit_bg − logsumexp < log(1 − t)``, and class probabilities are only
    needed at the ≤ ``max_components`` component centroids, so the full-grid
    softmax (≈30 ms of the 71.6 ms batch-32 e2e alongside extraction) never
    exists. Reference chain being replaced: softmax → uint8 → threshold
    (unet-inference-with-map.py:610-626).
    """
    h, w, c = logits.shape
    lf = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(lf, axis=-1)
    fg = (lf[..., 0] - lse) < jnp.log1p(-bg_threshold)

    def cls_probs_at(ri, ci):
        rows = lf[ri, ci, :]  # (max_components, C)
        return jax.nn.softmax(rows, axis=-1)[:, 1:]

    return _finish_extraction(
        fg, cls_probs_at, class_score_threshold, max_components, max_pixels,
        n_angles, open_iterations,
    )


def _finish_extraction(fg, cls_probs_at, class_score_threshold,
                       max_components, max_pixels, n_angles, open_iterations):
    h, w = fg.shape
    fg = morph_open(fg, iterations=open_iterations)
    boxes, valid, counts, centroids = mask_to_rotated_boxes(
        fg, max_components=max_components, max_pixels=max_pixels, n_angles=n_angles
    )

    # Nearest-pixel class probabilities at the centroid.
    ci = jnp.clip(centroids[:, 0].astype(jnp.int32), 0, w - 1)
    ri = jnp.clip(centroids[:, 1].astype(jnp.int32), 0, h - 1)
    cls_probs = cls_probs_at(ri, ci)  # (max_components, C-1)
    detect = (cls_probs >= class_score_threshold) & valid[:, None]
    return {
        "boxes_px": boxes,
        "box_valid": valid,
        "counts": counts,
        "centroids": centroids,
        "scores": cls_probs,
        "detect": detect,
    }
