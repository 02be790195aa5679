"""Rotated-rectangle IoU via vectorized Sutherland–Hodgman polygon clipping.

TPU-native replacement for the reference's polygon-clipping CUDA kernels
(``PointRCNN/lib/utils/iou3d/src/iou3d_kernel.cu:50-236`` and the numba-CUDA
``second/second/core/non_max_suppression/nms_gpu.py:511+``). Instead of the
sequential per-pair vertex walk, we clip with fixed-capacity vertex buffers
(a convex quad clipped by 4 half-planes has ≤ 8 vertices) so the whole
(N, M) IoU matrix is one fused vmap — all static shapes, XLA-friendly.

BEV boxes are (..., 5) ``[x, y, w, l, yaw]``; 3D boxes (..., 7)
``[x, y, z, w, l, h, yaw]`` (z = center).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lyft3d_tpu.ops.box_ops import box_corners_2d

__all__ = [
    "polygon_intersection_area",
    "rotated_iou_bev",
    "rotated_iou_3d",
    "rotated_overlap_bev",
    "standup_iou",
]

_MAX_VERTS = 8


def _clip_halfplane(verts, count, a, b):
    """Clip a convex polygon by the half-plane left of the directed edge a→b.

    Args:
        verts: (K, 2) padded vertex buffer (first ``count`` valid, CCW).
        count: scalar int32 number of valid vertices.
        a, b: (2,) clip-edge endpoints (CCW edge of the clip polygon).

    Returns:
        (new_verts, new_count) with the same buffer size.
    """
    k = verts.shape[0]
    d = b - a
    rel = verts - a[None, :]
    side = d[0] * rel[:, 1] - d[1] * rel[:, 0]  # >0 = inside (left of a→b)

    idx = jnp.arange(k)
    nxt = jnp.where(idx >= count - 1, 0, idx + 1)
    e = verts[nxt]
    s_side = side
    e_side = side[nxt]
    valid_edge = idx < count

    s_in = s_side >= 0.0
    e_in = e_side >= 0.0
    denom = s_side - e_side
    t = s_side / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    inter = verts + (e - verts) * t[:, None]

    # Per edge, in order: [crossing intersection?, endpoint e?]
    emit0 = valid_edge & (s_in != e_in)
    emit1 = valid_edge & e_in
    cand = jnp.stack([inter, e], axis=1).reshape(2 * k, 2)
    emit = jnp.stack([emit0, emit1], axis=1).reshape(2 * k)

    pos = jnp.cumsum(emit) - 1
    scatter_idx = jnp.where(emit, pos, k)  # out-of-range rows dropped
    out = jnp.zeros_like(verts).at[scatter_idx].set(cand, mode="drop")
    return out, jnp.sum(emit).astype(jnp.int32)


def _polygon_area(verts, count):
    """Shoelace area of the first ``count`` vertices of a padded buffer."""
    k = verts.shape[0]
    idx = jnp.arange(k)
    nxt = jnp.where(idx >= count - 1, 0, idx + 1)
    v2 = verts[nxt]
    cross = verts[:, 0] * v2[:, 1] - verts[:, 1] * v2[:, 0]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(idx < count, cross, 0.0)))


def polygon_intersection_area(corners1, corners2):
    """Intersection area of two convex quads given as (4, 2) CCW corners."""
    verts = jnp.zeros((_MAX_VERTS, 2), dtype=corners1.dtype).at[:4].set(corners1)
    count = jnp.asarray(4, dtype=jnp.int32)
    for i in range(4):
        verts, count = _clip_halfplane(verts, count, corners2[i], corners2[(i + 1) % 4])
    return _polygon_area(verts, count)


_ROW_CHUNK = 64


def _pairwise(fn, corners1, corners2):
    """Pairwise map with bounded memory.

    A flat vmap² materializes every pair's clip buffers simultaneously —
    (N·M·8·2·2) floats, 32 GB at N=M=1000 batch 4 — so rows are processed in
    ``_ROW_CHUNK`` blocks via ``lax.map`` (sequential over blocks, vectorized
    within).
    """
    n = corners1.shape[0]
    if n <= _ROW_CHUNK:
        return jax.vmap(lambda c1: jax.vmap(lambda c2: fn(c1, c2))(corners2))(corners1)
    pad = (-n) % _ROW_CHUNK
    padded = jnp.pad(corners1, ((0, pad), (0, 0), (0, 0)))
    blocks = padded.reshape(-1, _ROW_CHUNK, 4, 2)

    def block_fn(c1_block):
        return jax.vmap(
            lambda c1: jax.vmap(lambda c2: fn(c1, c2))(corners2)
        )(c1_block)

    out = jax.lax.map(block_fn, blocks)
    return out.reshape(-1, corners2.shape[0])[:n]


def rotated_overlap_bev(boxes1, boxes2):
    """(N, M) BEV intersection areas of rotated boxes (N,5) × (M,5)."""
    c1 = box_corners_2d(boxes1)
    c2 = box_corners_2d(boxes2)
    return _pairwise(polygon_intersection_area, c1, c2)


def rotated_iou_bev(boxes1, boxes2, criterion: int = -1):
    """(N, M) BEV rotated IoU.

    ``criterion``: −1 → intersection/union (IoU); 0 → intersection/area1;
    1 → intersection/area2 (the eval variants of
    ``nms_gpu.rotate_iou_gpu_eval:605``).
    """
    inter = rotated_overlap_bev(boxes1, boxes2)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    if criterion == 0:
        denom = a1 + jnp.zeros_like(a2)
    elif criterion == 1:
        denom = a2 + jnp.zeros_like(a1)
    else:
        denom = a1 + a2 - inter
    return inter / jnp.maximum(denom, 1e-12)


def rotated_iou_3d(boxes1, boxes2):
    """(N, M) 3D rotated IoU: BEV polygon intersection × vertical overlap.

    Same decomposition as ``iou3d_utils.boxes_iou3d_gpu:21-54``: boxes are
    ``[x,y,z,w,l,h,yaw]`` with z at the box center.
    """
    bev1 = jnp.concatenate([boxes1[:, 0:2], boxes1[:, 3:5], boxes1[:, 6:7]], axis=-1)
    bev2 = jnp.concatenate([boxes2[:, 0:2], boxes2[:, 3:5], boxes2[:, 6:7]], axis=-1)
    inter_bev = rotated_overlap_bev(bev1, bev2)

    zmax1 = (boxes1[:, 2] + boxes1[:, 5] / 2)[:, None]
    zmin1 = (boxes1[:, 2] - boxes1[:, 5] / 2)[:, None]
    zmax2 = (boxes2[:, 2] + boxes2[:, 5] / 2)[None, :]
    zmin2 = (boxes2[:, 2] - boxes2[:, 5] / 2)[None, :]
    h_overlap = jnp.maximum(jnp.minimum(zmax1, zmax2) - jnp.maximum(zmin1, zmin2), 0.0)

    inter = inter_bev * h_overlap
    vol1 = (boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])[:, None]
    vol2 = (boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])[None, :]
    return inter / jnp.maximum(vol1 + vol2 - inter, 1e-12)


def standup_iou(boxes1, boxes2):
    """(N, M) axis-aligned IoU of [xmin, ymin, xmax, ymax] boxes.

    The cheap prefilter used by the reference CPU NMS
    (``nms_cpu.rotate_nms_cc:17``).
    """
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    a2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    return inter / jnp.maximum(a1[:, None] + a2[None, :] - inter, 1e-12)
