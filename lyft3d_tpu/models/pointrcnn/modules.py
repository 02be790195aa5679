"""PointNet++ set-abstraction / feature-propagation modules (flax).

Capability of ``PointRCNN/pointnet2_lib/pointnet2/pointnet2_modules.py``
(``PointnetSAModuleMSG:58`` FPS → multi-radius ball query → grouping →
shared MLP → max-pool; ``PointnetSAModule:95``; ``PointnetFPModule:116``
3-NN inverse-distance upsampling) over the fixed-capacity ops in
``lyft3d_tpu.ops.pointnet2``. Unbatched (vmap at the network level).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.ops.pointnet2 import (
    fps,
    group_points,
    multi_radius_ball_query,
    three_interpolate,
    three_nn,
)


class SharedMLP(nn.Module):
    """Pointwise Dense+norm+ReLU stack (pytorch_utils.SharedMLP).

    ``norm`` options:
    - "layer" (training default): LayerNorm after each Dense — pure
      train step, but per-sample statistics can NOT be folded into the
      Dense, so a layer-trained checkpoint never reaches "folded".
    - "batch": BatchNorm with running stats — the reference's
      ``BatchNorm1d/2d`` (``pytorch_utils.py:5-236``). Train steps apply
      with ``mutable=["batch_stats"]`` (detected via
      ``is_mutable_collection``, like ``layers.ConvNormAct``).
    - "folded": deployment structure (Dense WITH bias, no norm op).
      Reachable from a trained "batch" checkpoint via
      ``models.fold_bn.fold_batch_norms`` — function-preserving for
      eval-mode outputs (exactness-tested). On the grouped SA tensors
      every norm op is a full-activation HBM round-trip (~9 ms per norm
      at the RCNN stage-1 (400, 128, 64, 128) shape, v5e-1), so the
      folded structure matters at inference."""

    features: Sequence[int]
    dtype: Any = jnp.float32
    norm: str = "layer"

    @nn.compact
    def __call__(self, x):
        for f in self.features:
            if self.norm == "folded":
                x = nn.Dense(f, use_bias=True, dtype=self.dtype)(x)
            elif self.norm == "batch":
                x = nn.Dense(f, use_bias=False, dtype=self.dtype)(x)
                x = nn.BatchNorm(
                    use_running_average=not self.is_mutable_collection(
                        "batch_stats"
                    ),
                    dtype=self.dtype,
                )(x)
            else:
                x = nn.Dense(f, use_bias=False, dtype=self.dtype)(x)
                x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction.

    __call__(xyz (N,3), features (N,C) or None, valid (N,)) →
    (new_xyz (S,3), new_features (S, ΣC'), new_valid (S,)).
    """

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    dtype: Any = jnp.float32
    norm: str = "layer"
    # Grid-bucketed neighbor search (O(S·9·cap) instead of the (S, N)
    # distance matrix) when static plane bounds are configured and the
    # source cloud is large enough to pay for the bucket build.
    grid_bounds: Any = None
    grid_plane: Any = (0, 2)
    grid_min_n: int = 2048

    @nn.compact
    def __call__(self, xyz, features, valid):
        sel = fps(xyz, valid, self.npoint)
        new_xyz = xyz[sel]
        new_valid = valid[sel]

        # Cast features to the compute dtype BEFORE the (S, K, C) group
        # gather — the gathered tensor is the module's bandwidth peak
        # (e.g. 440 MB f32 vs 220 MB bf16 at the RCNN stage-1 shape) and
        # the MLP would cast right after anyway. Geometry stays f32.
        feats_c = features.astype(self.dtype) if features is not None else None
        outs = []
        if self.grid_bounds is not None and xyz.shape[0] >= self.grid_min_n:
            from lyft3d_tpu.ops.pointnet2 import grid_multi_radius_ball_query

            queries = grid_multi_radius_ball_query(
                new_xyz, xyz, valid, self.radii, self.nsamples,
                bounds=tuple(map(tuple, self.grid_bounds)),
                plane=tuple(self.grid_plane),
            )
        else:
            # One shared (S, N) distance matrix serves every radius.
            queries = multi_radius_ball_query(
                new_xyz, xyz, valid, self.radii, self.nsamples
            )
        for (idx, count), nsample, mlp in zip(queries, self.nsamples, self.mlps):
            grouped_xyz = (group_points(xyz, idx) - new_xyz[:, None, :]).astype(
                self.dtype
            )
            if feats_c is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, group_points(feats_c, idx)], axis=-1
                ) if self.use_xyz else group_points(feats_c, idx)
            else:
                grouped = grouped_xyz
            h = SharedMLP(mlp, dtype=self.dtype, norm=self.norm)(grouped)  # (S, K, C')
            slot_ok = (jnp.arange(nsample)[None, :] < jnp.maximum(count, 1)[:, None])
            h = jnp.where(slot_ok[..., None], h, -jnp.inf)
            pooled = jnp.max(h, axis=1)
            pooled = jnp.where((count > 0)[:, None], pooled, 0.0)
            outs.append(pooled)
        return new_xyz, jnp.concatenate(outs, axis=-1), new_valid & True


class SAModuleGlobal(nn.Module):
    """Group-all set abstraction (PointnetSAModule with npoint=None)."""

    mlp: Sequence[int]
    use_xyz: bool = True
    dtype: Any = jnp.float32
    norm: str = "layer"

    @nn.compact
    def __call__(self, xyz, features, valid):
        x = jnp.concatenate([xyz, features], axis=-1) if self.use_xyz else features
        h = SharedMLP(self.mlp, dtype=self.dtype, norm=self.norm)(x)
        h = jnp.where(valid[:, None], h, -jnp.inf)
        pooled = jnp.max(h, axis=0)
        return pooled  # (C',)


class FPModule(nn.Module):
    """Feature propagation: 3-NN upsample + skip concat + MLP."""

    mlp: Sequence[int]
    dtype: Any = jnp.float32
    norm: str = "layer"

    @nn.compact
    def __call__(self, unknown_xyz, unknown_feats, known_xyz, known_feats, known_valid):
        d, idx = three_nn(unknown_xyz, known_xyz, known_valid)
        interp = three_interpolate(known_feats, idx, d)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp, dtype=self.dtype, norm=self.norm)(interp)
