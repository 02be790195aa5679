"""PointNet++ primitive ops: FPS, ball query, grouping, 3-NN interpolation,
RoI-pool3D — the reference's CUDA extensions N1–N6 (SURVEY.md §2.3,
``PointRCNN/pointnet2_lib/pointnet2/src/*.cu`` and
``PointRCNN/lib/utils/roipool3d``), rebuilt TPU-native.

Each op has a pure-jnp formulation (static shapes, vmap-able over batch);
furthest-point sampling — the only op with a true sequential dependency —
additionally ships a Pallas kernel (`fps_pallas`) that keeps the running
min-distance buffer resident in VMEM across the selection loop instead of
round-tripping HBM every step.

Convention: points are (N, 3) float32 rows with a (N,) validity mask;
features are (N, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "furthest_point_sample",
    "fps_pallas",
    "ball_query",
    "group_points",
    "three_nn",
    "three_interpolate",
    "roi_pool3d",
]

_BIG = 1e10


def furthest_point_sample(points, valid, npoint: int):
    """(N, 3) → (npoint,) int32 indices (sampling_gpu.cu capability).

    Iteratively picks the point furthest from the selected set, tracking a
    running min-distance buffer. Invalid points are never selected (if the
    valid count is smaller than npoint, selections repeat the argmax —
    harmless downstream because grouping masks by validity).
    """
    n = points.shape[0]
    start = jnp.argmax(valid)  # first valid point

    def body(i, carry):
        dists, selected, last = carry
        p = points[last]
        d = jnp.sum((points - p[None, :]) ** 2, axis=-1)
        dists = jnp.minimum(dists, jnp.where(valid, d, -1.0))
        nxt = jnp.argmax(dists).astype(jnp.int32)
        selected = selected.at[i].set(nxt)
        return dists, selected, nxt

    dists0 = jnp.where(valid, _BIG, -1.0)
    selected0 = jnp.zeros((npoint,), jnp.int32).at[0].set(start.astype(jnp.int32))
    # First iteration measures distance from the start point.
    dists, selected, _ = jax.lax.fori_loop(
        1, npoint, body, (dists0, selected0, start.astype(jnp.int32))
    )
    return selected


def _fps_kernel(pts_ref, valid_ref, out_ref, dist_ref):
    """Pallas FPS: pts (3, N) VMEM, valid (1, N), out (1, npoint) int32."""
    n = pts_ref.shape[1]
    npoint = out_ref.shape[1]
    valid = valid_ref[0, :] > 0
    start = jnp.argmax(valid).astype(jnp.int32)
    out_ref[0, 0] = start
    dist_ref[0, :] = jnp.where(valid, _BIG, -1.0)

    def body(i, last):
        px = pts_ref[0, last]
        py = pts_ref[1, last]
        pz = pts_ref[2, last]
        d = (
            (pts_ref[0, :] - px) ** 2
            + (pts_ref[1, :] - py) ** 2
            + (pts_ref[2, :] - pz) ** 2
        )
        nd = jnp.minimum(dist_ref[0, :], jnp.where(valid, d, -1.0))
        dist_ref[0, :] = nd
        nxt = jnp.argmax(nd).astype(jnp.int32)
        out_ref[0, i] = nxt
        return nxt

    jax.lax.fori_loop(1, npoint, body, start)


def fps_pallas(points, valid, npoint: int, interpret: bool = False):
    """Pallas TPU FPS; same contract as :func:`furthest_point_sample`."""
    n = points.shape[0]
    pts_t = points.T.astype(jnp.float32)  # (3, N)
    valid_i = valid.astype(jnp.int32)[None, :]  # (1, N)
    out = pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((1, npoint), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
        interpret=interpret,
    )(pts_t, valid_i)
    return out[0]


def _first_k_true(mask, k: int):
    """Indices of the first k True entries per row, plus found-count.

    mask: (..., N). Returns (idx (..., k) int32, count (...,)). Missing slots
    repeat the first found index (pointnet2 ball-query padding), or 0 if the
    row is empty.
    """
    n = mask.shape[-1]
    rank = jnp.cumsum(mask, axis=-1) - 1  # position among trues
    hit = mask & (rank < k)
    slot = jnp.where(hit, rank, k)
    idx_src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), mask.shape)

    def scatter_row(slot_row, idx_row):
        return jnp.full((k + 1,), -1, jnp.int32).at[slot_row].set(idx_row, mode="drop")[:k]

    flat_slot = slot.reshape(-1, n)
    flat_idx = idx_src.reshape(-1, n)
    out = jax.vmap(scatter_row)(flat_slot, flat_idx).reshape(mask.shape[:-1] + (k,))
    count = jnp.minimum(jnp.sum(mask, axis=-1), k)
    first = out[..., :1]
    out = jnp.where(out < 0, jnp.maximum(first, 0), out)
    return out.astype(jnp.int32), count


def ball_query(centers, points, valid, radius: float, nsample: int):
    """(S, 3) centers × (N, 3) points → (S, nsample) indices + (S,) counts
    (ball_query_gpu.cu capability: ≤ nsample points within radius, padded by
    repeating the first hit)."""
    d2 = jnp.sum((centers[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    mask = (d2 < radius * radius) & valid[None, :]
    return _first_k_true(mask, nsample)


def group_points(features, idx):
    """Gather (N, C) features by (S, K) indices → (S, K, C)
    (group_points_gpu.cu; gradient via JAX autodiff)."""
    return features[idx]


def three_nn(unknown, known, known_valid):
    """For each of (N, 3) unknown points: 3 nearest (M, 3) known points.

    Returns (dists (N, 3), idx (N, 3)) — interpolate_gpu.cu capability.
    """
    d2 = jnp.sum((unknown[:, None, :] - known[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(known_valid[None, :], d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features, idx, dists, eps: float = 1e-8):
    """Inverse-distance weighted interpolation: (M, C) known features →
    (N, C) at unknown points given (N, 3) idx/dists."""
    w = 1.0 / (dists * dists + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.sum(features[idx] * w[..., None], axis=-2)


def roi_pool3d(points, features, valid, boxes, num_sampled: int = 512,
               extra_width: float = 0.0):
    """Sample ≤ num_sampled points inside each (R, 7) box, concatenating xyz
    with features; returns (pooled (R, num_sampled, 3+C), count (R,),
    empty (R,)) — roipool3d_kernel.cu + pts_in_boxes3d capability.
    Boxes are [x, y, z, w, l, h, yaw] with z at the box CENTER.
    """
    x, y, z = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    w = boxes[:, 3] + 2 * extra_width
    l = boxes[:, 4] + 2 * extra_width
    h = boxes[:, 5] + 2 * extra_width
    yaw = boxes[:, 6]

    d = points[None, :, :3] - jnp.stack([x, y, z], -1)[:, None, :]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = c[:, None] * d[:, :, 0] + s[:, None] * d[:, :, 1]
    ly = -s[:, None] * d[:, :, 0] + c[:, None] * d[:, :, 1]
    inside = (
        (jnp.abs(lx) <= l[:, None] / 2)
        & (jnp.abs(ly) <= w[:, None] / 2)
        & (jnp.abs(d[:, :, 2]) <= h[:, None] / 2)
        & valid[None, :]
    )
    idx, count = _first_k_true(inside, num_sampled)
    feats = jnp.concatenate([points[:, :3], features], axis=-1)
    # Missing slots repeat the first member (the CUDA kernel's cyclic fill);
    # fully-empty boxes are zeroed and flagged.
    pooled = feats[idx] * (count > 0)[:, None, None].astype(feats.dtype)
    return pooled, count, count == 0
