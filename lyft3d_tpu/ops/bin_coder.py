"""Bin-based box encoding for PointRCNN (jnp).

Capability of the reference's ``decode_bbox_target``
(``PointRCNN/lib/utils/bbox_transform.py:24-121``) and the bin-based
regression targets in ``loss_utils.get_reg_loss:87-233``: ground-plane
offsets (our lidar frame: x, y) are classified into bins over
±``loc_scope`` plus a normalized within-bin residual; the vertical offset
(z) is a direct residual; heading is classified into ``num_head_bin`` bins
over 2π plus residual; size is a relative residual against a per-class mean
size.

The flat channel layout (packing order) is::

    [x_bin (B) | y_bin (B) | x_res (B) | y_res (B) |
     head_bin (H) | head_res (H) | z_res (1) | size_res (3)]

with B = 2·loc_scope/loc_bin_size bins per axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["BinCoderConfig", "encode_bin_targets", "decode_bin_boxes",
           "decode_refined_boxes", "bin_reg_loss"]

from lyft3d_tpu.train.losses import smooth_l1


@dataclass(frozen=True)
class BinCoderConfig:
    loc_scope: float = 3.0
    loc_bin_size: float = 0.5
    num_head_bin: int = 12
    mean_size: Tuple[float, float, float] = (1.9, 4.6, 1.7)  # (w, l, h)
    # Per-class mean-size table (CLS_MEAN_SIZE, tools/cfgs/default.yaml:20:
    # one (w, l, h) row per class). When set, encode/decode index it with
    # the per-anchor ``class_ids`` argument; ``mean_size`` is the fallback
    # for callers without class information.
    class_mean_sizes: Optional[Tuple[Tuple[float, float, float], ...]] = None

    def means_for(self, n: int, class_ids=None):
        """(N, 3) mean sizes: the per-class table row per anchor, or the
        global mean broadcast."""
        if self.class_mean_sizes is not None and class_ids is not None:
            table = jnp.asarray(self.class_mean_sizes)
            idx = jnp.clip(class_ids, 0, table.shape[0] - 1)
            return table[idx]
        return jnp.broadcast_to(jnp.asarray(self.mean_size), (n, 3))

    @property
    def num_loc_bins(self) -> int:
        return int(2 * self.loc_scope / self.loc_bin_size)

    @property
    def channels(self) -> int:
        return 4 * self.num_loc_bins + 2 * self.num_head_bin + 1 + 3

    def slices(self) -> Dict[str, slice]:
        b, h = self.num_loc_bins, self.num_head_bin
        o = 0
        out = {}
        for name, width in (
            ("x_bin", b), ("y_bin", b), ("x_res", b), ("y_res", b),
            ("head_bin", h), ("head_res", h), ("z_res", 1), ("size_res", 3),
        ):
            out[name] = slice(o, o + width)
            o += width
        return out


def encode_bin_targets(anchors_xyz, gt_boxes, cfg: BinCoderConfig,
                       class_ids=None):
    """Targets for points/RoIs at (N, 3) anchor positions vs (N, 7) GTs.

    Returns dict of integer bin labels and float residuals (already
    normalized), for use by :func:`bin_reg_loss`. ``class_ids`` selects
    per-class mean sizes when the config carries a table.
    """
    dx = gt_boxes[:, 0] - anchors_xyz[:, 0]
    dy = gt_boxes[:, 1] - anchors_xyz[:, 1]
    dz = gt_boxes[:, 2] - anchors_xyz[:, 2]
    nb = cfg.num_loc_bins

    def to_bin(d):
        shifted = jnp.clip(d + cfg.loc_scope, 0.0, 2 * cfg.loc_scope - 1e-4)
        b = jnp.floor(shifted / cfg.loc_bin_size).astype(jnp.int32)
        res = (shifted - (b.astype(d.dtype) + 0.5) * cfg.loc_bin_size) / cfg.loc_bin_size
        return jnp.clip(b, 0, nb - 1), res

    x_bin, x_res = to_bin(dx)
    y_bin, y_res = to_bin(dy)

    angle_per_bin = 2 * jnp.pi / cfg.num_head_bin
    heading = jnp.mod(gt_boxes[:, 6], 2 * jnp.pi)
    h_bin = jnp.clip(
        jnp.floor(heading / angle_per_bin).astype(jnp.int32), 0, cfg.num_head_bin - 1
    )
    h_res = (heading - (h_bin.astype(heading.dtype) + 0.5) * angle_per_bin) / (
        angle_per_bin / 2
    )

    mean = cfg.means_for(gt_boxes.shape[0], class_ids)
    size_res = (gt_boxes[:, 3:6] - mean) / mean
    return {
        "x_bin": x_bin, "x_res": x_res,
        "y_bin": y_bin, "y_res": y_res,
        "head_bin": h_bin, "head_res": h_res,
        "z_res": dz,
        "size_res": size_res,
    }


def decode_bin_boxes(anchors_xyz, reg, cfg: BinCoderConfig, class_ids=None):
    """(N, channels) raw head output → (N, 7) boxes at anchor positions."""
    sl = cfg.slices()
    nb = cfg.num_loc_bins

    def from_bin(bin_logits, res_all, d0):
        b = jnp.argmax(bin_logits, axis=-1)
        res = jnp.take_along_axis(res_all, b[:, None], axis=-1)[:, 0]
        pos = (b.astype(res.dtype) + 0.5) * cfg.loc_bin_size + res * cfg.loc_bin_size
        return pos - cfg.loc_scope + d0

    x = from_bin(reg[:, sl["x_bin"]], reg[:, sl["x_res"]], anchors_xyz[:, 0])
    y = from_bin(reg[:, sl["y_bin"]], reg[:, sl["y_res"]], anchors_xyz[:, 1])
    z = anchors_xyz[:, 2] + reg[:, sl["z_res"]][:, 0]

    angle_per_bin = 2 * jnp.pi / cfg.num_head_bin
    hb = jnp.argmax(reg[:, sl["head_bin"]], axis=-1)
    hres = jnp.take_along_axis(reg[:, sl["head_res"]], hb[:, None], axis=-1)[:, 0]
    yaw = (hb.astype(hres.dtype) + 0.5) * angle_per_bin + hres * (angle_per_bin / 2)
    yaw = jnp.mod(yaw + jnp.pi, 2 * jnp.pi) - jnp.pi

    mean = cfg.means_for(reg.shape[0], class_ids)
    size = reg[:, sl["size_res"]] * mean + mean
    return jnp.stack([x, y, z, size[:, 0], size[:, 1], size[:, 2], yaw], axis=-1)


def decode_refined_boxes(rois, rcnn_reg, cfg: BinCoderConfig, class_ids=None):
    """RCNN regression → refined boxes in the LIDAR frame.

    The RCNN head regresses in each RoI's canonical frame (origin at the
    RoI center, x along its heading — the frame ``canonical_transform``
    pools points in), so decoding at the origin yields a canonical-frame
    box that must be rotated by the RoI yaw and translated back
    (``eval_rcnn.py:117-694`` decodes rcnn_reg via ``decode_bbox_target``
    with the RoI as anchor before final scoring).
    """
    canon = decode_bin_boxes(
        jnp.zeros((rois.shape[0], 3), rcnn_reg.dtype), rcnn_reg, cfg, class_ids
    )
    c, s = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])
    x = c * canon[:, 0] - s * canon[:, 1] + rois[:, 0]
    y = s * canon[:, 0] + c * canon[:, 1] + rois[:, 1]
    z = canon[:, 2] + rois[:, 2]
    yaw = canon[:, 6] + rois[:, 6]
    yaw = jnp.mod(yaw + jnp.pi, 2 * jnp.pi) - jnp.pi
    return jnp.stack(
        [x, y, z, canon[:, 3], canon[:, 4], canon[:, 5], yaw], axis=-1
    )


def bin_reg_loss(reg, targets, fg_mask, cfg: BinCoderConfig):
    """Bin CE + residual smooth-L1 over foreground anchors
    (get_reg_loss:87-233 semantics). Returns (scalar loss, dict)."""
    sl = cfg.slices()
    nfg = jnp.maximum(jnp.sum(fg_mask), 1.0)

    def ce(logits, labels):
        lp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(lp, labels[:, None], axis=-1)[:, 0]
        return jnp.sum(-ll * fg_mask) / nfg

    def res_loss(res_all, labels, target):
        picked = jnp.take_along_axis(res_all, labels[:, None], axis=-1)[:, 0]
        return jnp.sum(smooth_l1(picked - target) * fg_mask) / nfg

    loss_x = ce(reg[:, sl["x_bin"]], targets["x_bin"]) + res_loss(
        reg[:, sl["x_res"]], targets["x_bin"], targets["x_res"]
    )
    loss_y = ce(reg[:, sl["y_bin"]], targets["y_bin"]) + res_loss(
        reg[:, sl["y_res"]], targets["y_bin"], targets["y_res"]
    )
    loss_h = ce(reg[:, sl["head_bin"]], targets["head_bin"]) + res_loss(
        reg[:, sl["head_res"]], targets["head_bin"], targets["head_res"]
    )
    loss_z = jnp.sum(smooth_l1(reg[:, sl["z_res"]][:, 0] - targets["z_res"]) * fg_mask) / nfg
    loss_size = jnp.sum(
        smooth_l1(reg[:, sl["size_res"]] - targets["size_res"]).sum(-1) * fg_mask
    ) / nfg
    total = loss_x + loss_y + loss_h + loss_z + loss_size
    return total, {
        "loc": loss_x + loss_y + loss_z,
        "head": loss_h,
        "size": loss_size,
    }
