"""Box algebra on device (jax.numpy; fully jit/vmap-able, static shapes).

Covers the capability of the reference's numpy/torch box libraries
(``second/second/core/box_np_ops.py``, ``second/second/pytorch/core/
box_torch_ops.py``): residual box encode/decode (incl. the sin-error angle
vector encoding), corner extraction, yaw rotation, standup (axis-aligned)
boxes, period limiting. Everything takes/returns plain arrays with a trailing
box dim of 7: ``[x, y, z, w, l, h, yaw]``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "limit_period",
    "rotate_points_2d",
    "box_corners_2d",
    "box_corners_3d",
    "corners_to_standup_2d",
    "encode_boxes",
    "decode_boxes",
    "add_sin_difference",
]


def limit_period(val, offset: float = 0.5, period: float = jnp.pi):
    """Wrap ``val`` into ``[-offset*period, (1-offset)*period)``."""
    return val - jnp.floor(val / period + offset) * period


def rotate_points_2d(points, angle):
    """Rotate (..., N, 2) points by (...,) angles about the origin (+z CCW)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y = points[..., 0], points[..., 1]
    xr = c[..., None] * x - s[..., None] * y
    yr = s[..., None] * x + c[..., None] * y
    return jnp.stack([xr, yr], axis=-1)


def box_corners_2d(boxes):
    """BEV corners of rotated boxes.

    Args:
        boxes: (..., 5) ``[x, y, w, l, yaw]`` (w = extent along the local y
            axis, l = along local x, consistent with core.box.Box).

    Returns:
        (..., 4, 2) corners in CCW order.
    """
    x, y, w, l, yaw = (boxes[..., i] for i in range(5))
    # CCW order for positive-area shoelace: (+l/2,+w/2), (-l/2,+w/2),
    # (-l/2,-w/2), (+l/2,-w/2)
    lx = jnp.stack([l, -l, -l, l], axis=-1) / 2.0
    wy = jnp.stack([w, w, -w, -w], axis=-1) / 2.0
    local = jnp.stack([lx, wy], axis=-1)  # (..., 4, 2)
    rot = rotate_points_2d(local, yaw)
    return rot + jnp.stack([x, y], axis=-1)[..., None, :]


def box_corners_3d(boxes):
    """(..., 8, 3) corners of (..., 7) ``[x,y,z,w,l,h,yaw]`` boxes.

    First four corners are the bottom face (CCW), last four the top face,
    with ``z`` being the box center (bottom at z−h/2).
    """
    bev = jnp.concatenate(
        [boxes[..., 0:2], boxes[..., 3:5], boxes[..., 6:7]], axis=-1
    )
    c2 = box_corners_2d(bev)  # (..., 4, 2)
    z = boxes[..., 2]
    h = boxes[..., 5]
    zb = (z - h / 2.0)[..., None]
    zt = (z + h / 2.0)[..., None]
    bottom = jnp.concatenate([c2, jnp.broadcast_to(zb[..., None], c2[..., :1].shape)], axis=-1)
    top = jnp.concatenate([c2, jnp.broadcast_to(zt[..., None], c2[..., :1].shape)], axis=-1)
    return jnp.concatenate([bottom, top], axis=-2)


def corners_to_standup_2d(corners):
    """(..., 4, 2) corners → (..., 4) axis-aligned [xmin, ymin, xmax, ymax]."""
    mins = jnp.min(corners, axis=-2)
    maxs = jnp.max(corners, axis=-2)
    return jnp.concatenate([mins, maxs], axis=-1)


def encode_boxes(boxes, anchors, encode_angle_to_vector: bool = False, smooth_dim: bool = False):
    """SECOND residual box encoding (box_np_ops.second_box_encode:36).

    Center deltas normalized by the anchor BEV diagonal (x, y) and height (z);
    dims as log ratios (or ratio−1 with ``smooth_dim``); angle as a raw delta
    or a (cos, sin) vector delta.

    Args:
        boxes:   (..., 7) ground-truth ``[x,y,z,w,l,h,yaw]``.
        anchors: (..., 7) anchors, broadcastable to ``boxes``.

    Returns:
        (..., 7) or (..., 8) residual targets.
    """
    xg, yg, zg, wg, lg, hg, rg = (boxes[..., i] for i in range(7))
    xa, ya, za, wa, la, ha, ra = (anchors[..., i] for i in range(7))
    diag = jnp.sqrt(wa**2 + la**2)
    xt = (xg - xa) / diag
    yt = (yg - ya) / diag
    zt = (zg - za) / ha
    if smooth_dim:
        wt = wg / wa - 1.0
        lt = lg / la - 1.0
        ht = hg / ha - 1.0
    else:
        wt = jnp.log(wg / wa)
        lt = jnp.log(lg / la)
        ht = jnp.log(hg / ha)
    if encode_angle_to_vector:
        rtx = jnp.cos(rg) - jnp.cos(ra)
        rty = jnp.sin(rg) - jnp.sin(ra)
        return jnp.stack([xt, yt, zt, wt, lt, ht, rtx, rty], axis=-1)
    rt = rg - ra
    return jnp.stack([xt, yt, zt, wt, lt, ht, rt], axis=-1)


def decode_boxes(deltas, anchors, encode_angle_to_vector: bool = False, smooth_dim: bool = False):
    """Inverse of :func:`encode_boxes` (box_np_ops.second_box_decode:74)."""
    xa, ya, za, wa, la, ha, ra = (anchors[..., i] for i in range(7))
    diag = jnp.sqrt(wa**2 + la**2)
    xt, yt, zt, wt, lt, ht = (deltas[..., i] for i in range(6))
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    if smooth_dim:
        wg = (wt + 1.0) * wa
        lg = (lt + 1.0) * la
        hg = (ht + 1.0) * ha
    else:
        wg = jnp.exp(wt) * wa
        lg = jnp.exp(lt) * la
        hg = jnp.exp(ht) * ha
    if encode_angle_to_vector:
        rtx, rty = deltas[..., 6], deltas[..., 7]
        rg = jnp.arctan2(rty + jnp.sin(ra), rtx + jnp.cos(ra))
    else:
        rg = deltas[..., 6] + ra
    return jnp.stack([xg, yg, zg, wg, lg, hg, rg], axis=-1)


def add_sin_difference(boxes1_rot, boxes2_rot):
    """Sin-error angle encoding for the localization loss.

    Replaces the raw angle residual pair (pred_rot, target_rot) with
    (sin(p)·cos(t), cos(p)·sin(t)) so smooth-L1 on their difference equals a
    loss on sin(p − t) — the trick in ``voxelnet.create_loss``
    (second/second/pytorch/models/voxelnet.py:683+).
    """
    rad_pred = jnp.sin(boxes1_rot) * jnp.cos(boxes2_rot)
    rad_tg = jnp.cos(boxes1_rot) * jnp.sin(boxes2_rot)
    return rad_pred, rad_tg
