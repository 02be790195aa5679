"""PointRCNN: PointNet++ RPN → proposals → RCNN refinement (flax).

Capability of the reference nets:
- ``Pointnet2MSG`` backbone, 4 SA + 4 FP (``lib/net/pointnet2_msg.py:11-70``);
- RPN heads: per-point foreground logit + bin-based regression
  (``lib/net/rpn.py:30-82``, focal-init bias :61-66);
- ``ProposalLayer`` decode + NMS → fixed proposal set
  (``lib/rpn/proposal_layer.py:9-145``);
- ``ProposalTargetLayer`` train-time RoI sampling (fg ≥ 0.55, 50% fg quota,
  ``lib/rpn/proposal_target_layer.py``);
- ``RCNNNet`` RoI-pool 512 pts → canonical transform → SA stack → cls + bin
  reg (``lib/net/rcnn_net.py:14-190``);
- joint wiring ``PointRCNN`` (``lib/net/point_rcnn.py:8-70``).

All unbatched with fixed capacities; vmap over the batch outside.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.pointrcnn.modules import (
    FPModule,
    SAModuleGlobal,
    SAModuleMSG,
    SharedMLP,
)
from lyft3d_tpu.ops.bin_coder import (
    BinCoderConfig,
    decode_bin_boxes,
    decode_refined_boxes,
)
from lyft3d_tpu.ops.nms import rotated_nms, select_top_k
from lyft3d_tpu.ops.pointnet2 import roi_pool3d
from lyft3d_tpu.ops.rotated_iou import rotated_iou_3d


@dataclass(frozen=True)
class PointRCNNConfig:
    # backbone (SA_CONFIG, cfgs/default.yaml:41-48, scaled down by default)
    sa_npoints: Tuple[int, ...] = (1024, 256, 64, 16)
    sa_radii: Tuple[Tuple[float, ...], ...] = ((0.5, 1.0), (1.0, 2.0), (2.0, 4.0), (4.0, 8.0))
    sa_nsamples: Tuple[Tuple[int, ...], ...] = ((16, 32), (16, 32), (16, 32), (16, 32))
    sa_widths: Tuple[int, ...] = (32, 64, 128, 256)
    fp_width: int = 128
    # RPN head / coder
    rpn_coder: BinCoderConfig = field(default_factory=BinCoderConfig)
    # proposals
    num_proposals: int = 64
    nms_pre: int = 256
    proposal_nms_iou: float = 0.8
    # distance-bucketed NMS (proposal_layer.py:59-125): the near bucket
    # (< bucket_radius) gets near_fraction of the proposal quota.
    distance_bucket: bool = False
    bucket_radius: float = 40.0
    near_fraction: float = 0.7
    # RCNN
    rcnn_coder: BinCoderConfig = field(
        default_factory=lambda: BinCoderConfig(loc_scope=1.5, loc_bin_size=0.5)
    )
    roi_points: int = 128
    roi_extra_width: float = 1.0
    rcnn_sa_npoints: Tuple[int, ...] = (64, 16)
    rcnn_widths: Tuple[int, ...] = (128, 256)
    rcnn_sa_radii: Tuple[float, ...] = (1.0, 1.0)
    rcnn_sa_nsamples: Tuple[int, ...] = (16, 16)
    # proposal targets
    fg_iou: float = 0.55
    bg_iou: float = 0.45
    rois_per_image: int = 32
    fg_fraction: float = 0.5
    # Hard-background mining (sample_bg_inds, kitti_rcnn_dataset.py:1065 /
    # proposal_target_layer.py:184-211): backgrounds with IoU in
    # [bg_iou_lo, bg_iou) are "hard" and get hard_bg_ratio of the bg quota.
    bg_iou_lo: float = 0.05  # CLS_BG_THRESH_LO, config.py:130
    hard_bg_ratio: float = 0.8  # HARD_BG_RATIO, cfgs/default.yaml:122
    # IoU-controlled RoI-noise resampling attempts for fg RoIs
    # (ROI_FG_AUG_TIMES, cfgs/default.yaml:73; bg RoIs get 1 attempt).
    roi_fg_aug_times: int = 10
    # final NMS over REFINED boxes at eval (eval_rcnn.py joint mode)
    final_nms_iou: float = 0.1
    # Grid-bucketed ball query for the SA stages (None = dense (S, N)
    # path): static ((lo_a, hi_a), (lo_b, hi_b)) extents of the two
    # grid_plane axes (KITTI-rect clouds: plane (x, z)). See
    # ops.pointnet2.grid_multi_radius_ball_query.
    grid_bounds: Any = None
    grid_plane: Tuple[int, int] = (0, 2)


# Lyft 9-class mean sizes (w, l, h) — CLS_MEAN_SIZE,
# tools/cfgs/default.yaml:20 (stored there as (w, h, l) in camera coords).
LYFT_CLS_MEAN_SIZES = (
    (1.93, 4.76, 1.72),   # car
    (0.96, 2.35, 1.59),   # motorcycle
    (2.96, 12.34, 3.44),  # bus
    (0.63, 1.76, 1.44),   # bicycle
    (2.84, 10.24, 3.44),  # truck
    (0.77, 0.81, 1.78),   # pedestrian
    (2.79, 8.20, 3.23),   # other_vehicle
    (0.36, 0.73, 0.51),   # animal
    (2.45, 6.52, 2.39),   # emergency_vehicle
)

LYFT_CLASS_NAMES = (
    "car", "motorcycle", "bus", "bicycle", "truck", "pedestrian",
    "other_vehicle", "animal", "emergency_vehicle",
)


def lyft_pointrcnn_config(
    mode: str = "test", class_name: str = "car"
) -> PointRCNNConfig:
    """Reference-capacity Lyft config (tools/cfgs/default.yaml): 16384-point
    input, SA pyramid 4096/1024/256/64 with paired-radius MSG groups, FP to
    128-ch point features, 512 train / 100 test proposals with
    distance-bucketed NMS (0.85 train / 0.8 test), 512 RoI points, RCNN SA
    128/32 + global.

    ``class_name`` selects the active CLS_MEAN_SIZE row, mirroring the
    reference's one-class-per-run scheme (``tools/train_rcnn.py:222`` /
    ``eval_rcnn.py:888`` set ``cfg.CLS_MEAN_SIZE = [CLASS_MEAN[cls]]`` at
    startup) — the size prior the bin coder regresses against is the mean
    of the class being trained, for all 9 Lyft classes.
    """
    train = mode == "train"
    mean = LYFT_CLS_MEAN_SIZES[LYFT_CLASS_NAMES.index(class_name)]
    return PointRCNNConfig(
        sa_npoints=(4096, 1024, 256, 64),
        sa_radii=((0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0)),
        sa_nsamples=((16, 32), (16, 32), (16, 32), (16, 32)),
        sa_widths=(48, 128, 256, 512),  # 2 MSG branches => 96/256/512/1024 ch
        fp_width=128,
        rpn_coder=BinCoderConfig(
            loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12,
            mean_size=mean, class_mean_sizes=LYFT_CLS_MEAN_SIZES,
        ),
        num_proposals=512 if train else 100,
        nms_pre=1024,
        proposal_nms_iou=0.85 if train else 0.8,
        distance_bucket=True,
        bucket_radius=40.0,
        near_fraction=0.7,
        rcnn_coder=BinCoderConfig(
            loc_scope=1.5, loc_bin_size=0.5, num_head_bin=9,
            mean_size=mean, class_mean_sizes=LYFT_CLS_MEAN_SIZES,
        ),
        roi_points=512,
        roi_extra_width=1.0,
        rcnn_sa_npoints=(128, 32),
        rcnn_widths=(128, 256, 512),
        rcnn_sa_radii=(0.2, 0.4),
        rcnn_sa_nsamples=(64, 64),
        # Grid-bucketed SA neighbor search: measured EQUAL to the dense
        # (S, N) + approx_min_k path at these capacities (v5e-1 batch 4:
        # RPN fwd 92.3 vs 91.4 ms, joint 209.3 vs 210.7 —
        # scripts/microbench_grid_bq.py), because the ball query is no
        # longer the bottleneck after the round-4 selection work; the
        # dense path stays default (exact, no cell_cap approximation).
        # Enable per-experiment with e.g.
        # grid_bounds=((-64.0, 64.0), (-8.0, 120.0)), grid_plane=(0, 2).
        fg_iou=0.55,
        bg_iou=0.45,
        rois_per_image=64,
        fg_fraction=0.5,
        final_nms_iou=0.1,
    )


class PointRCNNBackbone(nn.Module):
    """Pointnet2MSG: SA pyramid + FP back to per-point features."""

    cfg: PointRCNNConfig
    dtype: Any = jnp.float32
    norm: str = "layer"

    @nn.compact
    def __call__(self, xyz, features, valid):
        c = self.cfg
        stack = [(xyz, features, valid)]
        for npoint, radii, nsamples, w in zip(
            c.sa_npoints, c.sa_radii, c.sa_nsamples, c.sa_widths
        ):
            x, f, v = stack[-1]
            mlps = [[w, w] for _ in radii]
            x2, f2, v2 = SAModuleMSG(
                npoint=npoint, radii=radii, nsamples=nsamples, mlps=mlps,
                dtype=self.dtype, norm=self.norm,
                grid_bounds=c.grid_bounds, grid_plane=c.grid_plane,
            )(x, f, v)
            stack.append((x2, f2, v2))

        # FP path back up.
        up_feats = stack[-1][1]
        for i in range(len(stack) - 1, 0, -1):
            ux, uf, uv = stack[i - 1]
            kx, _, kv = stack[i]
            up_feats = FPModule([c.fp_width, c.fp_width], dtype=self.dtype,
                                norm=self.norm)(
                ux, uf, kx, up_feats, kv
            )
        return up_feats  # (N, fp_width)


class PointRCNN_RPN(nn.Module):
    cfg: PointRCNNConfig
    dtype: Any = jnp.float32
    norm: str = "layer"

    @nn.compact
    def __call__(self, xyz, features, valid):
        feats = PointRCNNBackbone(self.cfg, dtype=self.dtype, norm=self.norm)(
            xyz, features, valid)
        h = SharedMLP([self.cfg.fp_width], dtype=self.dtype, norm=self.norm)(feats)
        # Focal-style init bias on the fg logit (rpn.py:61-66).
        cls = nn.Dense(
            1, bias_init=nn.initializers.constant(-jnp.log((1 - 0.01) / 0.01))
        )(h)[:, 0]
        reg = nn.Dense(self.cfg.rpn_coder.channels)(h)
        return {"point_features": feats, "cls": cls, "reg": reg}


def proposal_layer(xyz, cls_logits, reg, valid, cfg: PointRCNNConfig):
    """Decode per-point boxes → score top-k → rotated NMS → fixed proposals
    (proposal_layer.py:15-125; score-based variant)."""
    boxes = decode_bin_boxes(xyz, reg, cfg.rpn_coder)
    scores = jax.nn.sigmoid(cls_logits)
    scores = jnp.where(valid, scores, -1.0)

    k = min(cfg.nms_pre, scores.shape[0])
    # Full argsort + slice: exact, and 2x faster than lax.top_k(k=1024)
    # on TPU at the 16384-point row length (26 vs 54 ms at batch 4, v5e-1).
    top_idx = jnp.argsort(-scores)[:k]
    top_scores = scores[top_idx]
    top_boxes = boxes[top_idx]
    bev = jnp.concatenate([top_boxes[:, 0:2], top_boxes[:, 3:5], top_boxes[:, 6:7]], -1)
    keep = rotated_nms(bev, top_scores, cfg.proposal_nms_iou, valid=top_scores > 0)

    if cfg.distance_bucket:
        # Near/far quota split (proposal_layer.py:59-125).
        dist = jnp.linalg.norm(top_boxes[:, :2], axis=-1)
        near = dist < cfg.bucket_radius
        n_near = int(round(cfg.num_proposals * cfg.near_fraction))
        n_far = cfg.num_proposals - n_near
        sel_n, val_n = select_top_k(keep & near, top_scores, n_near)
        sel_f, val_f = select_top_k(keep & ~near, top_scores, n_far)
        sel = jnp.concatenate([sel_n, sel_f])
        sel_valid = jnp.concatenate([val_n, val_f])
    else:
        sel, sel_valid = select_top_k(keep, top_scores, cfg.num_proposals)
    return {
        "rois": top_boxes[sel],
        "roi_scores": top_scores[sel],
        "roi_valid": sel_valid,
    }


def _random_subset(rng, member, n):
    """Keep mask selecting min(n, |member|) members uniformly at random.

    ``n`` may be traced. Random priorities within the member set, rank by
    argsort, keep ranks < n — the fixed-shape analogue of
    ``np.random.permutation(count)[:n]``.
    """
    pri = jax.random.uniform(rng, member.shape)
    pri = jnp.where(member, pri, 2.0)
    order = jnp.argsort(pri)
    rank = jnp.zeros_like(order).at[order].set(
        jnp.arange(member.shape[0], dtype=order.dtype)
    )
    return member & (rank < n)


def proposal_target_layer(rois, roi_valid, gt_boxes, gt_valid, cfg: PointRCNNConfig, rng):
    """Train-time RoI sampling: IoU3D vs GT, RANDOM fg subsampling and
    hard-background mining (``sample_rois_for_rcnn``
    proposal_target_layer.py:79-182 + ``sample_bg_inds`` :184-211 /
    kitti_rcnn_dataset.py:1065).

    fg = IoU ≥ fg_iou, subsampled at random to fg_fraction·rois_per_image;
    background splits into hard (IoU ∈ [bg_iou_lo, bg_iou)) and easy
    (IoU < bg_iou_lo); hard backgrounds get hard_bg_ratio of the remaining
    quota, with spill between the two pools when one runs short (the
    reference tops up by sampling WITH replacement — a fixed-capacity mask
    cannot duplicate rows, so short pools spill instead).

    Returns per-roi: assigned gt index, fg mask, sampled keep mask, IoU.
    """
    iou = rotated_iou_3d(rois, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.where(roi_valid, jnp.max(iou, axis=1), -1.0)
    fg = best_iou >= cfg.fg_iou
    hard_bg = (best_iou < cfg.bg_iou) & (best_iou >= cfg.bg_iou_lo) & roi_valid
    easy_bg = (best_iou < cfg.bg_iou_lo) & (best_iou >= 0.0) & roi_valid

    k_fg, k_hard, k_easy = jax.random.split(rng, 3)
    n_fg_max = int(round(cfg.rois_per_image * cfg.fg_fraction))
    n_fg = jnp.minimum(n_fg_max, jnp.sum(fg))
    keep_fg = _random_subset(k_fg, fg, n_fg)

    n_bg = cfg.rois_per_image - n_fg
    n_hard_avail = jnp.sum(hard_bg)
    n_easy_avail = jnp.sum(easy_bg)
    hard_quota = jnp.minimum(
        jnp.floor(n_bg * cfg.hard_bg_ratio).astype(n_bg.dtype), n_hard_avail
    )
    easy_take = jnp.minimum(n_bg - hard_quota, n_easy_avail)
    hard_take = jnp.minimum(n_bg - easy_take, n_hard_avail)
    keep_bg = _random_subset(k_hard, hard_bg, hard_take) | _random_subset(
        k_easy, easy_bg, easy_take
    )
    keep = keep_fg | keep_bg
    return {"assigned_gt": best_gt, "fg": keep_fg, "keep": keep, "max_iou": best_iou}


def _elementwise_iou3d(boxes1, boxes2):
    """(N, 7) vs (N, 7) row-paired IoU3D."""
    return jax.vmap(
        lambda a, b: rotated_iou_3d(a[None], b[None])[0, 0]
    )(boxes1, boxes2)


def aug_rois_with_noise(rois, rng, gt_of_rois=None, fg=None,
                        pos_iou: float = 0.55, attempts: int = 10,
                        keep_prob: float = 0.2, loc_range: float = 0.5,
                        size_range: float = 0.15,
                        yaw_range: float = float(jnp.pi) / 12):
    """Train-time RoI perturbation with IoU-controlled resampling
    (``aug_roi_by_noise_torch`` proposal_target_layer.py:213-240 /
    ``aug_roi_by_noise_batch`` kitti_rcnn_dataset.py:1093-1138).

    Per RoI, up to ``attempts`` candidate perturbations are drawn — each
    keeps the original box with probability ``keep_prob``, else jitters
    center (uniform ±loc_range), size (scale 1 ± size_range) and heading
    (uniform ±yaw_range) — the reference's REG_AUG_METHOD='single' ranges
    (:249-253). The FIRST candidate whose IoU3D with the RoI's assigned GT
    stays ≥ ``pos_iou`` wins; if none qualifies the last candidate is kept
    regardless (the reference's loop-exhaustion behavior), so foreground
    RoIs keep a foreground-shaped IoU distribution instead of degenerating
    to zero-IoU "foregrounds" under one-shot jitter.

    ``fg`` (bool mask) limits non-foreground RoIs to a single attempt
    (reference: bg aug_times = 1). Without ``gt_of_rois`` the first
    candidate is returned unconditionally (pure jitter).
    """
    r = rois.shape[0]
    k_keep, k_loc, k_size, k_yaw = jax.random.split(rng, 4)
    keep = jax.random.uniform(k_keep, (r, attempts)) < keep_prob
    loc_shift = jax.random.uniform(
        k_loc, (r, attempts, 3), minval=-loc_range, maxval=loc_range
    )
    size_scale = 1.0 + jax.random.uniform(
        k_size, (r, attempts, 3), minval=-size_range, maxval=size_range
    )
    yaw_shift = jax.random.uniform(
        k_yaw, (r, attempts), minval=-yaw_range, maxval=yaw_range
    )
    cand = jnp.concatenate(
        [
            rois[:, None, :3] + loc_shift,
            jnp.maximum(rois[:, None, 3:6] * size_scale, 0.1),
            (rois[:, None, 6:7] + yaw_shift[..., None]),
        ],
        axis=-1,
    ).astype(rois.dtype)
    cand = jnp.where(keep[..., None], rois[:, None, :], cand)
    if gt_of_rois is None:
        return cand[:, 0]

    iou = _elementwise_iou3d(
        cand.reshape(r * attempts, 7),
        jnp.repeat(gt_of_rois, attempts, axis=0),
    ).reshape(r, attempts)
    att = (
        jnp.where(fg, attempts, 1)
        if fg is not None
        else jnp.full((r,), attempts, jnp.int32)
    )
    allowed = jnp.arange(attempts)[None, :] < att[:, None]
    ok = (iou >= pos_iou) & allowed
    first = jnp.argmax(ok, axis=1)
    chosen = jnp.where(jnp.any(ok, axis=1), first, att - 1)
    return cand[jnp.arange(r), chosen]


def canonical_transform(pooled_xyz, rois):
    """Rotate RoI point samples into the box-canonical frame
    (rcnn_net.py:146-152): subtract center, rotate by −yaw."""
    rel = pooled_xyz - rois[:, None, :3]
    c, s = jnp.cos(-rois[:, 6]), jnp.sin(-rois[:, 6])
    x = c[:, None] * rel[..., 0] - s[:, None] * rel[..., 1]
    y = s[:, None] * rel[..., 0] + c[:, None] * rel[..., 1]
    return jnp.stack([x, y, rel[..., 2]], axis=-1)


class PointRCNN_RCNN(nn.Module):
    """Refinement head over canonical RoI point sets."""

    cfg: PointRCNNConfig
    dtype: Any = jnp.float32
    norm: str = "layer"

    @nn.compact
    def __call__(self, roi_points, roi_counts):
        """roi_points: (R, P, 3+C) canonical xyz + features."""
        c = self.cfg
        # Shared-parameter encoder vmapped over the RoI axis.
        sa = nn.vmap(
            _RoIEncoder,
            in_axes=(0, 0),
            variable_axes={"params": None},
            split_rngs={"params": False},
        )(cfg=c, dtype=self.dtype, norm=self.norm)
        g = sa(roi_points, roi_counts)  # (R, C')

        h = nn.Dense(c.rcnn_widths[-1], dtype=self.dtype)(g)
        h = nn.relu(h)
        cls = nn.Dense(1)(h)[:, 0]
        reg = nn.Dense(c.rcnn_coder.channels)(h)
        return {"cls": cls, "reg": reg}


class _RoIEncoder(nn.Module):
    cfg: PointRCNNConfig
    dtype: Any = jnp.float32
    norm: str = "layer"

    @nn.compact
    def __call__(self, pts, count):
        c = self.cfg
        xyz = pts[:, :3]
        feats = SharedMLP([c.rcnn_widths[0]], dtype=self.dtype,
                          norm=self.norm)(pts)
        valid = jnp.arange(pts.shape[0]) < jnp.maximum(count, 1)
        for npoint, w, r, ns in zip(
            c.rcnn_sa_npoints, c.rcnn_widths, c.rcnn_sa_radii, c.rcnn_sa_nsamples
        ):
            xyz, feats, valid = SAModuleMSG(
                npoint=npoint, radii=(r,), nsamples=(ns,), mlps=[[w, w]],
                dtype=self.dtype, norm=self.norm,
            )(xyz, feats, valid)
        return SAModuleGlobal([c.rcnn_widths[-1]], dtype=self.dtype,
                              norm=self.norm)(xyz, feats, valid)


class PointRCNN(nn.Module):
    """Joint two-stage net (point_rcnn.py:8-70): RPN → proposals →
    RoI-pool + canonical transform → RCNN heads.

    __call__(xyz (N,3), features (N,C)|None, valid (N,)) for ONE sample;
    vmap externally for batches.
    """

    cfg: PointRCNNConfig
    dtype: Any = jnp.float32
    norm: str = "layer"

    @nn.compact
    def __call__(self, xyz, features, valid):
        c = self.cfg
        feats_in = features if features is not None else jnp.zeros(
            (xyz.shape[0], 1), xyz.dtype
        )
        rpn_out = PointRCNN_RPN(c, dtype=self.dtype, norm=self.norm)(
            xyz, feats_in, valid)

        props = proposal_layer(
            xyz,
            jax.lax.stop_gradient(rpn_out["cls"]),
            jax.lax.stop_gradient(rpn_out["reg"]),
            valid,
            c,
        )
        rois = props["rois"]

        pooled, counts, empty = roi_pool3d(
            xyz,
            jax.lax.stop_gradient(rpn_out["point_features"]),
            valid,
            rois,
            num_sampled=c.roi_points,
            extra_width=c.roi_extra_width,
        )
        canon = canonical_transform(pooled[..., :3], rois)
        roi_pts = jnp.concatenate([canon, pooled[..., 3:]], axis=-1)
        rcnn_out = PointRCNN_RCNN(c, dtype=self.dtype, norm=self.norm)(
            roi_pts, counts)
        # The stage-2 deliverable: RCNN regression decoded into refined
        # lidar-frame boxes (eval_rcnn.py decodes rcnn_reg before scoring).
        refined = decode_refined_boxes(rois, rcnn_out["reg"], c.rcnn_coder)
        return {
            "rpn": rpn_out,
            "proposals": props,
            "rcnn": rcnn_out,
            "refined": refined,
            "roi_empty": empty,
        }


def rpn_point_labels(xyz, gt_boxes, gt_valid, extra_width: float = 0.2):
    """Per-point segmentation labels + assigned GT
    (generate_rpn_training_labels, kitti_rcnn_dataset.py:407-437):
    1 inside a GT box, −1 (ignore) in the enlarged margin, 0 background.
    """
    def member(boxes, extra):
        d = xyz[None, :, :] - boxes[:, None, :3]
        c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
        lx = c[:, None] * d[:, :, 0] + s[:, None] * d[:, :, 1]
        ly = -s[:, None] * d[:, :, 0] + c[:, None] * d[:, :, 1]
        ok = (
            (jnp.abs(lx) <= (boxes[:, 4] / 2 + extra)[:, None])
            & (jnp.abs(ly) <= (boxes[:, 3] / 2 + extra)[:, None])
            & (jnp.abs(d[:, :, 2]) <= (boxes[:, 5] / 2 + extra)[:, None])
            & gt_valid[:, None]
        )
        return ok

    inside = member(gt_boxes, 0.0)  # (G, N)
    enlarged = member(gt_boxes, extra_width)
    fg = inside.any(axis=0)
    ignore = enlarged.any(axis=0) & ~fg
    labels = jnp.where(fg, 1, jnp.where(ignore, -1, 0)).astype(jnp.int32)
    assigned = jnp.argmax(inside, axis=0).astype(jnp.int32)
    return labels, assigned


def rpn_loss(rpn_out, xyz, labels, assigned, gt_boxes, cfg: PointRCNNConfig,
             focal_alpha: float = 0.25, focal_gamma: float = 2.0):
    """Per-point focal fg/bg + bin-based regression over fg points
    (train_functions.py:56-216)."""
    from lyft3d_tpu.ops.bin_coder import bin_reg_loss, encode_bin_targets
    from lyft3d_tpu.train.losses import sigmoid_focal_loss

    care = (labels >= 0).astype(jnp.float32)
    fg = (labels == 1).astype(jnp.float32)
    cls_loss = sigmoid_focal_loss(
        rpn_out["cls"], fg, alpha=focal_alpha, gamma=focal_gamma
    )
    cls_loss = jnp.sum(cls_loss * care) / jnp.maximum(jnp.sum(care), 1.0)

    tgt = encode_bin_targets(xyz, gt_boxes[assigned], cfg.rpn_coder)
    reg_loss, comps = bin_reg_loss(rpn_out["reg"], tgt, fg, cfg.rpn_coder)
    total = cls_loss + reg_loss
    return total, {"rpn_cls": cls_loss, "rpn_reg": reg_loss, **comps}


def rcnn_loss(rcnn_out, rois, roi_targets, gt_boxes, cfg: PointRCNNConfig):
    """RCNN BCE(cls=iou-based) + canonical-frame bin regression."""
    from lyft3d_tpu.ops.bin_coder import bin_reg_loss, encode_bin_targets
    from lyft3d_tpu.train.losses import bce_with_logits

    keep = roi_targets["keep"].astype(jnp.float32)
    fg = roi_targets["fg"].astype(jnp.float32)
    cls_tgt = fg  # fg/bg classification target
    cls_raw = jnp.maximum(rcnn_out["cls"], -20.0)
    per = (
        jnp.maximum(cls_raw, 0) - cls_raw * cls_tgt + jnp.log1p(jnp.exp(-jnp.abs(cls_raw)))
    )
    cls_loss = jnp.sum(per * keep) / jnp.maximum(jnp.sum(keep), 1.0)

    # Canonical-frame targets: gt transformed into each roi's frame.
    gts = gt_boxes[roi_targets["assigned_gt"]]
    rel = gts[:, :3] - rois[:, :3]
    c, s = jnp.cos(-rois[:, 6]), jnp.sin(-rois[:, 6])
    rx = c * rel[:, 0] - s * rel[:, 1]
    ry = s * rel[:, 0] + c * rel[:, 1]
    canon_gt = jnp.concatenate(
        [
            jnp.stack([rx, ry, rel[:, 2]], -1),
            gts[:, 3:6],
            (gts[:, 6] - rois[:, 6])[:, None],
        ],
        axis=-1,
    )
    zeros = jnp.zeros((rois.shape[0], 3))
    tgt = encode_bin_targets(zeros, canon_gt, cfg.rcnn_coder)
    reg_loss, comps = bin_reg_loss(rcnn_out["reg"], tgt, fg, cfg.rcnn_coder)
    return cls_loss + reg_loss, {"rcnn_cls": cls_loss, "rcnn_reg": reg_loss}
