"""Anchor generation, anchor masking, and target assignment (jnp, static).

Capability of the reference's anchor machinery:
- ``create_anchors_3d_range`` (second/core/box_np_ops.py:602) — dense grid of
  (x, y, z, w, l, h, yaw) anchors over the detection range;
- the integral-image anchor mask (``sparse_sum_for_anchors_mask:918`` +
  ``fused_get_anchors_area:926`` — skip anchors over empty BEV area);
- ``TargetAssigner.assign_per_class`` / ``create_target_np``
  (core/target_assigner.py:38-130, core/target_ops.py:29-229) — per-anchor
  argmax matching with pos/neg thresholds, force-matching the best anchor of
  each GT, class labels and encoded regression targets.

Everything is vectorized over (A anchors × G padded GTs) — no per-anchor
python, no dynamic shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from lyft3d_tpu.ops.box_ops import box_corners_2d, corners_to_standup_2d, encode_boxes
from lyft3d_tpu.ops.rotated_iou import rotated_iou_bev, standup_iou

__all__ = [
    "AnchorSpec",
    "create_anchors_3d_range",
    "generate_anchors",
    "bev_occupancy_mask",
    "anchors_area_mask",
    "assign_targets",
]


class AnchorSpec(NamedTuple):
    """One class's anchor config (anchors.proto anchor_generator_range)."""

    size: Tuple[float, float, float]  # (w, l, h)
    z_center: float
    matched_threshold: float
    unmatched_threshold: float
    rotations: Tuple[float, ...] = (0.0, 1.5707963267948966)
    class_id: int = 1  # 1-based


def create_anchors_3d_range(
    feature_size: Tuple[int, int],
    point_range: Sequence[float],
    size: Tuple[float, float, float],
    z_center: float,
    rotations: Sequence[float] = (0.0, 1.5707963267948966),
):
    """(ny, nx) grid × rotations of one anchor size → (ny·nx·R, 7)."""
    ny, nx = feature_size
    x0, y0, _, x1, y1, _ = point_range[0], point_range[1], point_range[2], point_range[3], point_range[4], point_range[5]
    xs = (jnp.arange(nx) + 0.5) * (x1 - x0) / nx + x0
    ys = (jnp.arange(ny) + 0.5) * (y1 - y0) / ny + y0
    gx, gy = jnp.meshgrid(xs, ys)  # (ny, nx)
    rots = jnp.asarray(rotations)
    r = rots.shape[0]
    gx = jnp.broadcast_to(gx[..., None], (ny, nx, r)).reshape(-1)
    gy = jnp.broadcast_to(gy[..., None], (ny, nx, r)).reshape(-1)
    rot = jnp.broadcast_to(rots[None, None, :], (ny, nx, r)).reshape(-1)
    w, l, h = size
    a = jnp.stack(
        [
            gx,
            gy,
            jnp.full_like(gx, z_center),
            jnp.full_like(gx, w),
            jnp.full_like(gx, l),
            jnp.full_like(gx, h),
            rot,
        ],
        axis=-1,
    )
    return a


def generate_anchors(
    feature_size: Tuple[int, int],
    point_range: Sequence[float],
    specs: Sequence[AnchorSpec],
):
    """All classes' anchors + per-anchor thresholds/class ids.

    Layout matches the RPN head's flattening: position-major
    (ny, nx, spec, rotation) — location (y, x) varies slowest, then the
    spec (class), then the rotation — so ``head_output.reshape(-1, code)``
    lines up with ``anchors[i]``.

    Returns (anchors (A, 7), matched_thr (A,), unmatched_thr (A,),
    anchor_class (A,)).
    """
    ny, nx = feature_size
    per_spec, mt, ut, cls = [], [], [], []
    for spec in specs:
        r = len(spec.rotations)
        a = create_anchors_3d_range(
            feature_size, point_range, spec.size, spec.z_center, spec.rotations
        ).reshape(ny, nx, r, 7)
        per_spec.append(a)
        mt.append(jnp.full((r,), spec.matched_threshold))
        ut.append(jnp.full((r,), spec.unmatched_threshold))
        cls.append(jnp.full((r,), spec.class_id, jnp.int32))
    anchors = jnp.stack(per_spec, axis=2).reshape(-1, 7)  # (ny, nx, S, R, 7)
    n_loc = ny * nx
    mt = jnp.tile(jnp.concatenate(mt), n_loc)
    ut = jnp.tile(jnp.concatenate(ut), n_loc)
    cls = jnp.tile(jnp.concatenate(cls), n_loc)
    return anchors, mt, ut, cls


def bev_occupancy_mask(coords, voxel_valid, grid_hw: Tuple[int, int]):
    """(V, 3) voxel coords → (ny, nx) 0/1 occupancy (dense_voxel_map).
    Sorted-hint scatter (see ops/dense_fill.py measurements — the sorted
    hint halves TPU scatter cost; per-canvas-row searchsorted is 16×
    worse)."""
    ny, nx = grid_hw
    flat = jnp.sort(
        jnp.where(voxel_valid, coords[:, 1] * nx + coords[:, 0], ny * nx)
    )
    occ = jnp.zeros((ny * nx + 1,), jnp.float32).at[flat].set(
        1.0, unique_indices=False, indices_are_sorted=True
    )
    return occ[: ny * nx].reshape(ny, nx)


def anchors_area_mask(
    anchors_bev_standup, occupancy, point_range, min_area: float = 1.0
):
    """Integral-image occupied-area under each anchor's standup box
    (sparse_sum_for_anchors_mask + fused_get_anchors_area semantics).

    Args:
        anchors_bev_standup: (A, 4) [xmin, ymin, xmax, ymax] world coords.
        occupancy: (ny, nx) 0/1 BEV occupancy grid.
        point_range: (x0, y0, z0, x1, y1, z1).

    Returns:
        (A,) bool — anchors over ≥ min_area occupied cells.
    """
    ny, nx = occupancy.shape
    x0, y0, x1, y1 = point_range[0], point_range[1], point_range[3], point_range[4]
    integral = jnp.cumsum(jnp.cumsum(occupancy, axis=0), axis=1)
    integral = jnp.pad(integral, ((1, 0), (1, 0)))

    def to_idx(xs, ys, up):
        fx = (xs - x0) / (x1 - x0) * nx
        fy = (ys - y0) / (y1 - y0) * ny
        rnd = jnp.ceil if up else jnp.floor
        ix = jnp.clip(rnd(fx).astype(jnp.int32), 0, nx)
        iy = jnp.clip(rnd(fy).astype(jnp.int32), 0, ny)
        return ix, iy

    # Min corner floors, max corner ceils: sub-cell boxes still cover a cell.
    ix0, iy0 = to_idx(anchors_bev_standup[:, 0], anchors_bev_standup[:, 1], up=False)
    ix1, iy1 = to_idx(anchors_bev_standup[:, 2], anchors_bev_standup[:, 3], up=True)
    area = (
        integral[iy1, ix1] - integral[iy0, ix1] - integral[iy1, ix0] + integral[iy0, ix0]
    )
    return area >= min_area


def assign_targets(
    anchors,
    anchor_class,
    matched_thr,
    unmatched_thr,
    gt_boxes,
    gt_classes,
    gt_valid,
    anchor_mask=None,
    similarity: str = "nearest",
    encode_angle_to_vector: bool = False,
):
    """Vectorized create_target_np.

    Args:
        anchors: (A, 7); anchor_class/matched_thr/unmatched_thr: (A,).
        gt_boxes: (G, 7) padded; gt_classes: (G,) 1-based; gt_valid: (G,).
        anchor_mask: optional (A,) bool — anchors to consider at all.
        similarity: "nearest" (standup IoU of rotated corners) or "rotated".

    Returns dict: labels (A,) int32 (−1 don't-care, 0 bg, >0 class),
        bbox_targets (A, 7/8), reg_weights (A,), dir_targets (A,) int32.
    """
    a = anchors.shape[0]
    if anchor_mask is None:
        anchor_mask = jnp.ones((a,), bool)

    abev = jnp.concatenate([anchors[:, 0:2], anchors[:, 3:5], anchors[:, 6:7]], -1)
    gbev = jnp.concatenate([gt_boxes[:, 0:2], gt_boxes[:, 3:5], gt_boxes[:, 6:7]], -1)
    if similarity == "rotated":
        iou = rotated_iou_bev(abev, gbev)
    else:
        sa = corners_to_standup_2d(box_corners_2d(abev))
        sg = corners_to_standup_2d(box_corners_2d(gbev))
        iou = standup_iou(sa, sg)

    # Class-matched pairs only: anchor of class c matches GT of class c.
    class_ok = anchor_class[:, None] == gt_classes[None, :]
    pair_ok = class_ok & gt_valid[None, :] & anchor_mask[:, None]
    iou = jnp.where(pair_ok, iou, -1.0)

    best_gt = jnp.argmax(iou, axis=1)  # (A,)
    best_iou = jnp.max(iou, axis=1)

    # Force-match: each valid GT claims its single best anchor.
    best_anchor_per_gt = jnp.argmax(iou, axis=0)  # (G,)
    gt_best_iou = jnp.max(iou, axis=0)
    force = jnp.zeros((a,), bool).at[best_anchor_per_gt].set(
        gt_valid & (gt_best_iou > 0.0), mode="drop"
    )
    forced_gt = jnp.zeros((a,), jnp.int32).at[best_anchor_per_gt].set(
        jnp.arange(gt_boxes.shape[0], dtype=jnp.int32), mode="drop"
    )
    assigned_gt = jnp.where(force, forced_gt, best_gt)

    pos = force | (best_iou >= matched_thr)
    neg = (best_iou < unmatched_thr) & ~pos
    labels = jnp.where(
        pos,
        gt_classes[assigned_gt],
        jnp.where(neg, 0, -1),
    ).astype(jnp.int32)
    labels = jnp.where(anchor_mask, labels, -1)

    matched_gt = gt_boxes[assigned_gt]
    bbox_targets = encode_boxes(matched_gt, anchors, encode_angle_to_vector)
    bbox_targets = jnp.where(pos[:, None], bbox_targets, 0.0)
    reg_weights = pos.astype(jnp.float32)

    # Direction classifier target: sign of (gt_yaw − anchor_yaw) period 2π
    # (get_direction_target, voxelnet.py).
    dir_targets = (
        jnp.floor((matched_gt[:, 6] - anchors[:, 6]) / jnp.pi) % 2
    ).astype(jnp.int32)
    dir_targets = jnp.where(pos, dir_targets, 0)

    return {
        "labels": labels,
        "bbox_targets": bbox_targets,
        "reg_weights": reg_weights,
        "dir_targets": dir_targets,
        "assigned_gt": assigned_gt,
        "max_iou": best_iou,
    }


def tune_match_thresholds(
    anchors,
    anchor_class,
    gt_samples,
    class_ids,
    candidate_thresholds=(0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6),
    target_rate: float = 1.0,
    similarity: str = "nearest",
):
    """Auto-tune per-class matched thresholds by anchors-per-GT rate.

    Capability of ``helper_tune_target_assigner`` (second/pytorch/
    train.py:584-691): sweep candidate thresholds over sample GT sets and
    pick, per class, the highest threshold whose mean matched-anchor count
    per GT is ≥ ``target_rate``.

    Args:
        gt_samples: list of (gt_boxes (G,7), gt_classes (G,)) numpy pairs.
        class_ids: class ids (1-based) to tune.

    Returns: {class_id: threshold}.
    """
    import numpy as np

    abev = jnp.concatenate([anchors[:, 0:2], anchors[:, 3:5], anchors[:, 6:7]], -1)
    sa = corners_to_standup_2d(box_corners_2d(abev))

    rates = {cid: {t: [] for t in candidate_thresholds} for cid in class_ids}
    for gt_boxes, gt_classes in gt_samples:
        if len(gt_boxes) == 0:
            continue
        g = jnp.asarray(gt_boxes, jnp.float32)
        gbev = jnp.concatenate([g[:, 0:2], g[:, 3:5], g[:, 6:7]], -1)
        if similarity == "rotated":
            iou = np.asarray(rotated_iou_bev(abev, gbev))
        else:
            sg = corners_to_standup_2d(box_corners_2d(gbev))
            iou = np.asarray(standup_iou(sa, sg))
        acls = np.asarray(anchor_class)
        for cid in class_ids:
            cols = np.flatnonzero(np.asarray(gt_classes) == cid)
            if len(cols) == 0:
                continue
            sub = iou[acls == cid][:, cols]
            for t in candidate_thresholds:
                rates[cid][t].append((sub >= t).sum(axis=0).mean())

    out = {}
    for cid in class_ids:
        best = candidate_thresholds[0]
        for t in candidate_thresholds:
            vals = rates[cid][t]
            if vals and float(np.mean(vals)) >= target_rate:
                best = t
        out[cid] = float(best)
    return out


def assign_targets_pruned(
    anchors,
    anchor_class,
    matched_thr,
    unmatched_thr,
    gt_boxes,
    gt_classes,
    gt_valid,
    anchor_mask,
    max_active: int = 4096,
    similarity: str = "rotated",
    encode_angle_to_vector: bool = False,
):
    """assign_targets restricted to ≤ ``max_active`` masked anchors.

    Makes expensive similarities (rotated IoU) affordable at full grid scale:
    the integral-image anchor mask selects candidate anchors (cumsum
    compaction, fixed capacity), assignment runs on the subset, and results
    scatter back — everything else is don't-care (−1), exactly the
    reference's anchors_mask semantics (create_target_np with anchors_mask,
    data/preprocess.py:348-369).
    """
    a = anchors.shape[0]
    rank = jnp.cumsum(anchor_mask) - 1
    slot = jnp.where(anchor_mask & (rank < max_active), rank, max_active)
    sel = (
        jnp.zeros((max_active + 1,), jnp.int32)
        .at[slot]
        .set(jnp.arange(a, dtype=jnp.int32), mode="drop")[:max_active]
    )
    sel_valid = jnp.arange(max_active) < jnp.minimum(jnp.sum(anchor_mask), max_active)

    sub = assign_targets(
        anchors[sel],
        anchor_class[sel],
        matched_thr[sel],
        unmatched_thr[sel],
        gt_boxes,
        gt_classes,
        gt_valid,
        anchor_mask=sel_valid,
        similarity=similarity,
        encode_angle_to_vector=encode_angle_to_vector,
    )

    code = sub["bbox_targets"].shape[-1]
    scatter_idx = jnp.where(sel_valid, sel, a)
    labels = jnp.full((a + 1,), -1, jnp.int32).at[scatter_idx].set(
        sub["labels"], mode="drop"
    )[:a]
    bbox = jnp.zeros((a + 1, code)).at[scatter_idx].set(
        sub["bbox_targets"], mode="drop"
    )[:a]
    rw = jnp.zeros((a + 1,)).at[scatter_idx].set(sub["reg_weights"], mode="drop")[:a]
    dirs = jnp.zeros((a + 1,), jnp.int32).at[scatter_idx].set(
        sub["dir_targets"], mode="drop"
    )[:a]
    return {
        "labels": labels,
        "bbox_targets": bbox,
        "reg_weights": rw,
        "dir_targets": dirs,
    }
