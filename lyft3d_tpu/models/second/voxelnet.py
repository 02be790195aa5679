"""VoxelNet assembly: voxelize → encode → middle → RPN, + loss + predict.

Capability of ``second/second/pytorch/models/voxelnet.py`` (net assembly
:57-190, loss :239-313 with ``create_loss``'s sin-error encoding and
direction classifier, ``predict`` :379-630 decode → sigmoid → rotated NMS →
post-center-range filter), re-designed as pure functions over fixed-capacity
arrays: the model is a flax module; loss and predict are standalone jnp
functions so the same graph jits for train and eval.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.models.second.rpn import RPN
from lyft3d_tpu.models.second.voxel_encoder import (
    PillarFeatureNet,
    SimpleVoxel,
    VoxelFeatureExtractor,
    pillar_scatter,
)
from lyft3d_tpu.ops.anchors import AnchorSpec, generate_anchors
from lyft3d_tpu.ops.box_ops import add_sin_difference, decode_boxes, limit_period
from lyft3d_tpu.ops.nms import rotated_nms, select_top_k
from lyft3d_tpu.ops.voxelize import VoxelGrid
from lyft3d_tpu.train.losses import sigmoid_focal_loss, weighted_smooth_l1


@dataclass(frozen=True)
class VoxelNetConfig:
    grid: VoxelGrid = VoxelGrid(
        point_cloud_range=(-49.6, -49.6, -5.0, 49.6, 49.6, 3.0),
        voxel_size=(0.25, 0.25, 8.0),
    )
    max_voxels: int = 20000
    max_points_per_voxel: int = 20
    encoder: str = "pillars"  # simple | vfe | pillars
    encoder_features: Tuple[int, ...] = (64,)
    # Middle extractor: "scatter" = PointPillars BEV scatter;
    # "sparse_units" = THE production sparse path (SpMiddleFHD capability):
    # a stack over active z-slab UNITS of BEV columns (ops.column_sparse —
    # work scales with occupancy instead of the full column z; this is
    # what configs/second_lyft_9class_sparse.yaml selects and what the
    # bench times).
    # The other two sparse formulations are NOT production paths:
    # "sparse_columns" (dense-z BEV-column) is a measured alternative kept
    # for A/B comparison; "sparse" (per-voxel gather-einsum) is the
    # equivalence-test ORACLE — the direct transliteration of sparse-conv
    # semantics that the fast formulations are tested against
    # (tests/test_column_sparse.py), not something to train with.
    middle: str = "scatter"
    middle_features: Tuple[int, ...] = (16, 32, 64)
    middle_max_voxels: Tuple[int, ...] = (8192, 4096, 2048)
    # Stage-0 z-slab size of the "sparse_units" middle; must be divisible
    # by 2**(len(middle_features) - 1) so slabs halve with each stride.
    middle_z_slab: int = 8
    # Norm structure of the column-sparse middle layers: "layer" (default),
    # "batch" (the reference SpMiddleFHD's BatchNorm1d; train applies need
    # mutable=["batch_stats"]), or "folded" (inference conv+bias — the
    # BN-folds-into-conv deployment structure).
    middle_norm: str = "layer"
    anchor_specs: Tuple[AnchorSpec, ...] = (
        AnchorSpec(size=(1.93, 4.76, 1.72), z_center=-1.0,
                   matched_threshold=0.6, unmatched_threshold=0.45),
    )
    downsample: int = 2  # RPN first-stage stride (feature map = grid / this)
    rpn_layer_nums: Tuple[int, ...] = (3, 5, 5)
    rpn_strides: Tuple[int, ...] = (2, 2, 2)
    rpn_filters: Tuple[int, ...] = (64, 128, 256)
    rpn_up_strides: Tuple[float, ...] = (1, 2, 4)
    rpn_up_filters: Tuple[int, ...] = (128, 128, 128)
    encode_angle_to_vector: bool = False
    similarity: str = "nearest"  # anchor-GT matching: nearest (standup) | rotated
    # Ignore anchors over empty BEV area (anchor_area_threshold, SECOND
    # configs; integral-image mask ops/anchors.anchors_area_mask).
    anchor_area_threshold: float = 0.0  # 0 disables
    # Cap on mask-selected anchors when the pruned (rotated-capable)
    # assignment path is active.
    max_active_anchors: int = 4096
    num_classes: int = 1
    # loss
    cls_weight: float = 1.0
    loc_weight: float = 2.0
    dir_weight: float = 0.2
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # predict
    nms_pre: int = 1000
    nms_post: int = 300
    nms_iou: float = 0.5
    score_threshold: float = 0.05
    # True = suppress only within each class (box_torch_ops.multiclass_nms
    # :405); False = one NMS across classes (the Lyft config's single-NMS).
    per_class_nms: bool = False

    @property
    def middle_downsample(self) -> int:
        is_sparse = self.middle in ("sparse", "sparse_columns", "sparse_units")
        return 2 ** len(self.middle_features) if is_sparse else 1

    @property
    def feature_hw(self) -> Tuple[int, int]:
        # The RPN concatenates every block resized to block0's output scaled
        # by up_strides[0] (rpn.py RPNNoHeadBase semantics). Mirror the conv
        # arithmetic stage by stage — a rounded grid/ds ratio disagrees with
        # the convs at odd sizes (round-half-even vs ceil), which skewed the
        # anchor grid off the prediction grid. The reference all.fhd lands
        # at ~62² (69k anchors for 9 classes); up_strides[0] < 1 reproduces
        # that coarsening.
        nx, ny, _ = self.grid.grid_size
        h, w = ny, nx
        if self.middle in ("sparse", "sparse_columns", "sparse_units"):
            # Each stage: strided sparse conv, k=3, p=1 (sparse_conv.py
            # downsample_coords): n -> (n + 2 - 3)//2 + 1.
            for _ in self.middle_features:
                h = (h - 1) // 2 + 1
                w = (w - 1) // 2 + 1
        # RPN block0: SAME-padded conv, stride s: n -> ceil(n/s).
        s0 = self.rpn_strides[0]
        h = -(-h // s0)
        w = -(-w // s0)
        # resize_to block0's hw scaled by up_strides[0] (int() like rpn.py).
        return (int(h * self.rpn_up_strides[0]), int(w * self.rpn_up_strides[0]))

    @property
    def anchors_per_loc(self) -> int:
        return sum(len(s.rotations) for s in self.anchor_specs)

    @property
    def box_code_size(self) -> int:
        return 8 if self.encode_angle_to_vector else 7

    def make_anchors(self):
        return generate_anchors(
            self.feature_hw, self.grid.point_cloud_range, self.anchor_specs
        )


class VoxelNet(nn.Module):
    """voxels → per-anchor predictions. Batched: inputs carry a leading B."""

    config: VoxelNetConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_valid) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        nx, ny, _ = cfg.grid.grid_size

        if cfg.encoder == "simple":
            enc = SimpleVoxel(num_features=voxels.shape[-1], dtype=self.dtype)
        elif cfg.encoder == "vfe":
            enc = VoxelFeatureExtractor(features=cfg.encoder_features, dtype=self.dtype)
        else:
            enc = PillarFeatureNet(
                features=cfg.encoder_features,
                voxel_size=cfg.grid.voxel_size[:2],
                point_range=cfg.grid.point_cloud_range[:2],
                dtype=self.dtype,
            )

        feats = enc(voxels, num_points, coords)  # (B, V, C)
        if cfg.middle in ("sparse_columns", "sparse_units"):
            # Natively batched (NOT nn.vmap): the fused stencil kernel's
            # window fallback is a batch-level lax.cond that a vmapped
            # trace would degrade into run-both-branches select.
            from lyft3d_tpu.models.second.middle import (
                SparseMiddleColumns,
                SparseMiddleUnits,
            )
            from lyft3d_tpu.ops.sparse_conv import ActiveSet

            active = jax.vmap(
                lambda c, v: ActiveSet(
                    coords=c, valid=v, spatial_shape=cfg.grid.grid_size
                )
            )(coords, voxel_valid)
            common = dict(
                stage_features=cfg.middle_features,
                stage_max_voxels=cfg.middle_max_voxels,
                dtype=self.dtype,
                norm_type=cfg.middle_norm,
                # ops.voxelize emits (y, x, z)-ordered flat ids.
                assume_sorted_voxels=True,
            )
            if cfg.middle == "sparse_units":
                mid = SparseMiddleUnits(z_slab=cfg.middle_z_slab, **common)
            else:
                mid = SparseMiddleColumns(**common)
            bev3, _ = mid(feats, active)
            bev = bev3
        elif cfg.middle == "sparse":
            mid = nn.vmap(
                _SparseMiddleBatch,
                in_axes=(0, 0, 0),
                variable_axes={"params": None},
                split_rngs={"params": False},
            )(config=cfg, dtype=self.dtype)
            bev = mid(feats, coords, voxel_valid)
        else:
            # voxelize emits ascending-unique flat ids (nz == 1 for pillars)
            # → the no-sort path of the sorted-hint scatter.
            bev = jax.vmap(
                lambda f, c, vv: pillar_scatter(
                    f, c, vv, (ny, nx), assume_sorted=True
                )
            )(feats, coords, voxel_valid)

        preds = RPN(
            layer_nums=cfg.rpn_layer_nums,
            layer_strides=cfg.rpn_strides,
            num_filters=cfg.rpn_filters,
            upsample_strides=cfg.rpn_up_strides,
            num_upsample_filters=cfg.rpn_up_filters,
            num_anchors_per_loc=cfg.anchors_per_loc,
            num_classes=cfg.num_classes,
            box_code_size=cfg.box_code_size,
            dtype=self.dtype,
        )(bev)

        b = voxels.shape[0]
        a = cfg.anchors_per_loc
        return {
            "box": preds["box"].reshape(b, -1, cfg.box_code_size),
            "cls": preds["cls"].reshape(b, -1, cfg.num_classes),
            "dir": preds["dir"].reshape(b, -1, 2),
        }


class _SparseMiddleBatch(nn.Module):
    """Per-sample SpMiddleFHD stack over the 3D active-voxel set
    (models/second/middle.py), vmapped with shared params."""

    config: VoxelNetConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, coords, voxel_valid):
        from lyft3d_tpu.models.second.middle import SparseMiddle
        from lyft3d_tpu.ops.sparse_conv import ActiveSet

        cfg = self.config
        active = ActiveSet(
            coords=coords, valid=voxel_valid, spatial_shape=cfg.grid.grid_size
        )
        bev, _ = SparseMiddle(
            stage_features=cfg.middle_features,
            stage_max_voxels=cfg.middle_max_voxels,
            dtype=self.dtype,
        )(feats, active)
        return bev


def voxelnet_loss(preds, targets, cfg: VoxelNetConfig):
    """Focal cls + sin-error smooth-L1 loc + dir CE (voxelnet.py:239-313).

    targets: dict from ops.anchors.assign_targets, batched (B, A, ...).
    """
    labels = targets["labels"]  # (B, A) −1/0/class
    pos = (labels > 0).astype(jnp.float32)
    care = (labels >= 0).astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(pos, axis=1, keepdims=True), 1.0)

    # Classification: per-class sigmoid focal, background encoded as zeros.
    # num_classes == 1 means "objectness of the anchor's own class" (anchors
    # carry class identity): every positive is a 1 regardless of class id.
    if cfg.num_classes == 1:
        cls_onehot = pos[..., None]
    else:
        cls_onehot = (
            jax.nn.one_hot(labels - 1, cfg.num_classes, dtype=jnp.float32)
            * pos[..., None]
        )
    cls_loss = sigmoid_focal_loss(
        preds["cls"], cls_onehot, alpha=cfg.focal_alpha, gamma=cfg.focal_gamma
    ).sum(-1)
    cls_loss = jnp.sum(cls_loss * care / num_pos)

    # Localization with sin-error angle term.
    box_pred, box_tgt = preds["box"], targets["bbox_targets"]
    if not cfg.encode_angle_to_vector:
        sin_p, sin_t = add_sin_difference(box_pred[..., 6], box_tgt[..., 6])
        box_pred = jnp.concatenate([box_pred[..., :6], sin_p[..., None]], -1)
        box_tgt = jnp.concatenate([box_tgt[..., :6], sin_t[..., None]], -1)
    loc_loss = weighted_smooth_l1(box_pred, box_tgt, weights=pos / num_pos)
    loc_loss = jnp.sum(loc_loss)

    # Direction classifier.
    dir_logp = jax.nn.log_softmax(preds["dir"], axis=-1)
    dir_ll = jnp.take_along_axis(dir_logp, targets["dir_targets"][..., None], axis=-1)[..., 0]
    dir_loss = jnp.sum(-dir_ll * pos / num_pos)

    b = labels.shape[0]
    total = (
        cfg.cls_weight * cls_loss + cfg.loc_weight * loc_loss + cfg.dir_weight * dir_loss
    ) / b
    return total, {
        "cls_loss": cls_loss / b,
        "loc_loss": loc_loss / b,
        "dir_loss": dir_loss / b,
        "num_pos": jnp.sum(pos) / b,
    }


def voxelnet_predict(preds, anchors, anchor_class, cfg: VoxelNetConfig):
    """Decode + score + rotated NMS for ONE sample (vmap over batch).

    Returns dict of fixed-size (nms_post,) detections:
    boxes (nms_post, 7), scores, classes (1-based), valid.
    """
    boxes = decode_boxes(preds["box"], anchors, cfg.encode_angle_to_vector)
    scores_all = jax.nn.sigmoid(preds["cls"])  # (A, num_classes)
    scores = jnp.max(scores_all, axis=-1)
    cls_idx = jnp.argmax(scores_all, axis=-1)
    # With per-class anchors the anchor's own class wins; num_classes==1 means
    # "the anchor's class".
    pred_class = jnp.where(
        cfg.num_classes == 1, anchor_class, cls_idx.astype(jnp.int32) + 1
    )

    # Direction correction (limit_period + dir bit, voxelnet predict :600+).
    dir_bit = jnp.argmax(preds["dir"], axis=-1)
    yaw = boxes[..., 6]
    anchor_bit = jnp.floor((yaw - anchors[..., 6]) / jnp.pi) % 2
    yaw = jnp.where(dir_bit != anchor_bit.astype(dir_bit.dtype), yaw + jnp.pi, yaw)
    boxes = boxes.at[..., 6].set(limit_period(yaw, 0.5, 2 * jnp.pi))

    # Top-k prefilter then rotated NMS.
    k = min(cfg.nms_pre, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    top_class = pred_class[top_idx]
    valid = top_scores >= cfg.score_threshold

    bev = jnp.concatenate(
        [top_boxes[:, 0:2], top_boxes[:, 3:5], top_boxes[:, 6:7]], axis=-1
    )
    if cfg.per_class_nms:
        # Suppress only same-class overlaps (multiclass_nms:405): zero out
        # cross-class entries of the IoU matrix, one greedy sweep.
        from lyft3d_tpu.ops.nms import nms_mask_from_iou
        from lyft3d_tpu.ops.rotated_iou import rotated_iou_bev

        iou = rotated_iou_bev(bev, bev)
        same = top_class[:, None] == top_class[None, :]
        # top_k output is already descending by score → presorted greedy.
        keep = nms_mask_from_iou(
            jnp.where(same, iou, 0.0), top_scores, cfg.nms_iou, valid=valid,
            presorted=True,
        )
    else:
        keep = rotated_nms(bev, top_scores, cfg.nms_iou, valid=valid)
    # Clamp for tiny anchor grids (demo-scale configs can have fewer
    # candidates than nms_post).
    sel, sel_valid = select_top_k(keep, top_scores, min(cfg.nms_post, k))

    # Post-range filter (post_center_limit_range, :613-619).
    out_boxes = top_boxes[sel]
    r = cfg.grid.point_cloud_range
    inside = (
        (out_boxes[:, 0] >= r[0]) & (out_boxes[:, 0] <= r[3])
        & (out_boxes[:, 1] >= r[1]) & (out_boxes[:, 1] <= r[4])
    )
    return {
        "boxes": out_boxes,
        "scores": top_scores[sel],
        "classes": top_class[sel],
        "valid": sel_valid & inside,
    }
