"""Voxel feature encoders (flax).

Capability of ``second/second/pytorch/models/voxel_encoder.py``:
- ``SimpleVoxel`` (:207) — mean of the points in each voxel (the encoder the
  Lyft config uses);
- ``VoxelFeatureExtractor`` (:83-141) — two VFE layers (linear + masked
  max-pool concat) then a final max-pool;
- ``PillarFeatureNet`` (``pointpillars.py:154-239``) — pillar-relative
  offsets + cluster-center offsets as extra features, linear + max.

All operate on the fixed-capacity ``ops.voxelize`` output:
voxels (V, T, D), num_points (V,), coords (V, 3).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _point_mask(voxels, num_points):
    """(..., T, D) + (...,) → (..., T) membership mask."""
    t = voxels.shape[-2]
    return (jnp.arange(t) < num_points[..., None]).astype(voxels.dtype)


def voxel_mean(voxels, num_points):
    """(..., T, D) → (..., D) masked mean (SimpleVoxel:207)."""
    mask = _point_mask(voxels, num_points)
    s = jnp.sum(voxels * mask[..., None], axis=-2)
    return s / jnp.maximum(num_points[..., None], 1).astype(voxels.dtype)


class SimpleVoxel(nn.Module):
    """Mean encoder; output features = input point dims."""

    num_features: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, voxels, num_points, coords):
        return voxel_mean(voxels[..., : self.num_features], num_points).astype(self.dtype)


class VFELayer(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask):
        # (V, T, C) → linear+norm+relu → concat with per-voxel max (VFELayer).
        h = nn.Dense(self.features // 2, use_bias=False, dtype=self.dtype)(x)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.relu(h)
        h = h * mask[..., None]
        m = jnp.max(h, axis=-2, keepdims=True)
        return jnp.concatenate([h, jnp.broadcast_to(m, h.shape)], axis=-1)


class VoxelFeatureExtractor(nn.Module):
    """Two VFE layers + final linear + max-pool (VoxelFeatureExtractor:83)."""

    features: Sequence[int] = (32, 128)
    with_distance: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, voxels, num_points, coords):
        mask = _point_mask(voxels, num_points)
        mean = voxel_mean(voxels[..., :3], num_points)
        rel = voxels[..., :3] - mean[..., None, :]
        feats = [voxels, rel]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1).astype(self.dtype)
        for f in self.features:
            x = VFELayer(f, dtype=self.dtype)(x, mask)
        x = nn.Dense(self.features[-1], use_bias=False, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x) * mask[..., None]
        return jnp.max(x, axis=-2)


class PillarFeatureNet(nn.Module):
    """PointPillars encoder (pointpillars.py:154-239): augment points with
    cluster-center and pillar-center offsets, linear + masked max."""

    features: Sequence[int] = (64,)
    voxel_size: Tuple[float, float] = (0.25, 0.25)
    point_range: Tuple[float, float] = (-50.0, -50.0)  # (x0, y0)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, voxels, num_points, coords):
        mask = _point_mask(voxels, num_points)
        mean = voxel_mean(voxels[..., :3], num_points)
        cluster_rel = voxels[..., :3] - mean[..., None, :]
        px = (coords[..., 0].astype(voxels.dtype) + 0.5) * self.voxel_size[0] + self.point_range[0]
        py = (coords[..., 1].astype(voxels.dtype) + 0.5) * self.voxel_size[1] + self.point_range[1]
        pillar_rel = jnp.stack(
            [voxels[..., 0] - px[..., None], voxels[..., 1] - py[..., None]], axis=-1
        )
        x = jnp.concatenate([voxels, cluster_rel, pillar_rel], axis=-1).astype(self.dtype)
        for f in self.features:
            x = nn.Dense(f, use_bias=False, dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x) * mask[..., None]
        return jnp.max(x, axis=-2)


def pillar_scatter(features, coords, voxel_valid, grid_hw: Tuple[int, int],
                   assume_sorted: bool = False):
    """(V, C) pillar features → (ny, nx, C) dense BEV canvas
    (PointPillarsScatter:421) via the sorted-hint scatter of
    ops/dense_fill.py (2× over a plain scatter-add; the hot spot of the
    voxelnet forward). Pass ``assume_sorted=True`` when coords come from
    ``voxelize`` (ascending-unique flat ids with nz == 1)."""
    from lyft3d_tpu.ops.dense_fill import fill_rows_by_id

    ny, nx = grid_hw
    flat = coords[:, 1] * nx + coords[:, 0]
    canvas = fill_rows_by_id(features, flat, voxel_valid, ny * nx,
                             assume_sorted=assume_sorted)
    return canvas.reshape(ny, nx, features.shape[-1])
