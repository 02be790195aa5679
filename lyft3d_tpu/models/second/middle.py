"""Sparse middle feature extractors (flax over ops.sparse_conv).

Capability of ``second/second/pytorch/models/middle.py`` (``SpMiddleFHD``
:111-212: SubMConv3d stacks + strided SparseConv3d downsamples ×3 →
``.dense()`` → reshape (N, C·D, H, W); ``SparseMiddleExtractor:32``) without
spconv: each layer is the gather-einsum formulation from
``lyft3d_tpu.ops.sparse_conv``, with LayerNorm + ReLU on valid rows.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lyft3d_tpu.ops.sparse_conv import (
    ActiveSet,
    build_hash,
    downsample_coords,
    kernel_offsets,
    sparse_conv3d_gather,
)


class SubMConvLayer(nn.Module):
    """Submanifold sparse conv + LayerNorm + ReLU (SubMConv3d+BN+ReLU).

    ``fused="pallas"`` routes the gather+contraction through the fused
    VMEM-resident kernel (``ops.subm_conv_kernel`` — no (K, V, C) HBM
    materialization); "xla" is the gather+einsum formulation. "auto"
    selects xla: the current Mosaic toolchain cannot lower table-scale
    in-kernel row gathers at all (see ops/subm_conv_kernel.py header for
    the probe results), so the pallas path is interpret-mode-only for now.
    """

    features: int
    kernel_size: int = 3
    fused: str = "auto"  # "auto" | "pallas" | "xla"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features, active: ActiveSet, hash_, neighbors=None):
        from lyft3d_tpu.ops.sparse_conv import gather_by_rank

        k = self.kernel_size ** 3
        cin = features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, cin, self.features),
            jnp.float32,
        ).astype(self.dtype)
        if neighbors is None:
            from lyft3d_tpu.ops.sparse_conv import subm_neighbors

            neighbors = subm_neighbors(
                active, hash_, kernel_offsets(self.kernel_size)
            )
        if self.fused == "pallas":
            # The fused kernel is interpret-mode-only on the current Mosaic
            # toolchain (see ops/subm_conv_kernel.py header): compiled TPU
            # lowering of table-scale in-kernel row gathers crashes the
            # backend. Refuse loudly instead of crashing mid-train; the
            # production sparse path is SparseMiddleUnits
            # (ops.column_sparse), and this per-voxel formulation's
            # supported modes are "xla" / "auto".
            if jax.default_backend() == "tpu":
                raise NotImplementedError(
                    "SubMConvLayer(fused='pallas') cannot compile on TPU "
                    "(Mosaic lacks table-scale in-kernel row gathers; see "
                    "ops/subm_conv_kernel.py). Use fused='xla' (or 'auto'),"
                    " or the column-sparse middle (middle='sparse_columns')."
                )
            from lyft3d_tpu.ops.subm_conv_kernel import subm_conv_pallas

            # ranks index SORTED order; the ranks' V axis is active-list
            # (query) order, so the kernel output needs no un-permute.
            f_sorted = features[hash_[1]].astype(self.dtype)
            out = subm_conv_pallas(f_sorted, neighbors, w)
        else:
            gathered = gather_by_rank(features, hash_[1], neighbors)
            out = jnp.einsum(
                "kvc,kcd->vd", gathered.astype(self.dtype), w,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        out = nn.LayerNorm(dtype=self.dtype)(out)
        out = nn.relu(out) * active.valid[:, None].astype(self.dtype)
        return out


class SparseConvLayer(nn.Module):
    """Strided sparse conv producing a new (downsampled) active set."""

    features: int
    max_out: int
    kernel_size: int = 3
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features, active: ActiveSet):
        out_active = downsample_coords(
            active, self.max_out, self.kernel_size, self.stride, self.padding
        )
        k = self.kernel_size ** 3
        cin = features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, cin, self.features),
            jnp.float32,
        ).astype(self.dtype)
        gathered = sparse_conv3d_gather(
            features, active, out_active, self.kernel_size, self.stride, self.padding
        )
        out = jnp.einsum(
            "kvc,kcd->vd", gathered.astype(self.dtype), w,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = nn.LayerNorm(dtype=self.dtype)(out)
        out = nn.relu(out) * out_active.valid[:, None].astype(self.dtype)
        return out, out_active


def sparse_to_dense_bev(features, active: ActiveSet):
    """(V, C) features at (V, 3) coords → (ny, nx, nz·C) BEV map — the
    ``.dense()`` + reshape at the end of SpMiddleFHD (middle.py:199-212).
    Sorted-hint scatter (ops/dense_fill.py); ``downsample_coords`` emits
    ascending-unique flat ids, so no sort is needed.
    """
    from lyft3d_tpu.ops.dense_fill import fill_rows_by_id

    nx, ny, nz = active.spatial_shape
    c = features.shape[-1]
    flat = (active.coords[:, 2] * ny + active.coords[:, 1]) * nx + active.coords[:, 0]
    dense = fill_rows_by_id(features, flat, active.valid, nz * ny * nx,
                            assume_sorted=True)
    return (
        dense.reshape(nz, ny, nx, c).transpose(1, 2, 0, 3).reshape(ny, nx, nz * c)
    )


def _column_norm_act(module: nn.Module, out, mask, norm_type: str, dtype):
    """Shared norm + ReLU + activity masking for the column layers.

    ``norm_type`` (SpMiddleFHD interleaves BatchNorm1d, middle.py:111-212):
    - "layer": LayerNorm over channels (pure-function train step).
    - "batch": BatchNorm with running stats (the reference's choice; train
      applies need ``mutable=["batch_stats"]``). Stats are computed over
      ACTIVE voxels only (inactive entries are zero-masked before the
      norm, matching spconv's feature-row semantics approximately).
    - "folded": inference-only conv+bias structure — no norm op (the
      BN-folds-into-conv deployment win; see models/fold_bn.py).
    """
    if norm_type == "layer":
        out = nn.LayerNorm(dtype=dtype)(out.astype(dtype))
    elif norm_type == "batch":
        out = nn.BatchNorm(
            use_running_average=not module.is_mutable_collection(
                "batch_stats"
            ),
            dtype=dtype,
            name="BatchNorm_0",
        )(out.astype(dtype))
    elif norm_type == "folded":
        bias = module.param(
            "bias", nn.initializers.zeros, (out.shape[-1],), jnp.float32
        )
        out = out.astype(dtype) + bias.astype(dtype)
    else:
        raise ValueError(f"unknown norm_type {norm_type!r}")
    return nn.relu(out) * mask[..., None].astype(dtype)


class SubMColumnLayer(nn.Module):
    """Submanifold conv + norm + ReLU in the BEV-column formulation
    (``ops.column_sparse``). Natively BATCHED: the fused stencil kernel's
    window-coverage fallback is one batch-level ``lax.cond``, which must
    sit outside any vmap (a vmapped cond becomes a select that executes
    both branches). Neighbor matching is by column id inside the kernel —
    no precomputed neighbor ranks."""

    features: int
    dtype: Any = jnp.bfloat16
    method: str = "auto"
    norm_type: str = "layer"  # "layer" | "batch" | "folded"
    # Kernel tiling (see stencil_conv_batched): None = adaptive on the
    # chunked source width (narrow sources take bigger tiles; the window
    # must cover a whole tile's hit span or the coverage check trips the
    # slow ref fallback).
    t_tile: Any = None
    w_win: Any = None

    @nn.compact
    def __call__(self, colf, cols):
        from lyft3d_tpu.ops.column_sparse import subm_conv_columns_batched

        cin = colf.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (27, cin, self.features), jnp.float32,
        ).astype(self.dtype)
        out = subm_conv_columns_batched(
            colf.astype(self.dtype), cols, w, method=self.method,
            t_tile=self.t_tile, w_win=self.w_win,
        )
        return _column_norm_act(self, out, cols.mask, self.norm_type,
                                self.dtype)


class StridedColumnLayer(nn.Module):
    """Strided (k3 s2 p1) sparse conv over columns → new ColumnSet.
    Batched like ``SubMColumnLayer``."""

    features: int
    max_out: int
    dtype: Any = jnp.bfloat16
    method: str = "auto"
    norm_type: str = "layer"
    # Strided queries stride 2 over the input positions — and when a
    # downsample cap TRUNCATES a stage, the surviving prefix's in/out
    # density ratio drifts above 2 (measured 2.14 at FHD stage 2), so
    # w_win = 2·t_tile overflowed and silently ran the slow ref fallback.
    # 3·t_tile covers ratios to ~2.8 with jitter margin; the cond fallback
    # still guarantees correctness beyond.
    t_tile: int = 128
    w_win: int = 384

    @nn.compact
    def __call__(self, colf, cols):
        from lyft3d_tpu.ops.column_sparse import (
            downsample_columns,
            strided_conv_columns_batched,
        )

        cin = colf.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (27, cin, self.features), jnp.float32,
        ).astype(self.dtype)
        out_cols = jax.vmap(
            lambda c: downsample_columns(c, self.max_out)
        )(cols)
        out, omask = strided_conv_columns_batched(
            colf.astype(self.dtype), cols, out_cols, w, method=self.method,
            t_tile=self.t_tile, w_win=self.w_win,
        )
        out_cols = out_cols.replace(mask=omask)
        out = _column_norm_act(self, out, out_cols.mask, self.norm_type,
                               self.dtype)
        return out, out_cols


class SparseMiddleColumns(nn.Module):
    """SpMiddleFHD-style stack in the dense-z BEV-column formulation
    (config ``middle: sparse_columns``). Takes BATCHED inputs ((B, V, C)
    features, batched ActiveSet); caps bound COLUMNS per stage (columns
    ≤ voxels, so the reference voxel caps are safe).

    Superseded as the production sparse path by ``SparseMiddleUnits``
    (round 3): columns carry the FULL z extent densely, so per-layer work
    scales with nz rather than occupancy. Kept for A/B (the unit path is
    equivalence-tested against it in tests/test_unit_sparse.py)."""

    stage_features: Sequence[int] = (16, 32, 64)
    stage_max_voxels: Sequence[int] = (8192, 4096, 2048)
    subm_per_stage: int = 2
    dtype: Any = jnp.bfloat16
    method: str = "auto"
    norm_type: str = "layer"
    # True when the active set comes from ops.voxelize (its flat ids are
    # already (y·nx+x)·nz+z-ordered) — skips the column sort.
    assume_sorted_voxels: bool = False

    @nn.compact
    def __call__(self, features, active: ActiveSet):
        from lyft3d_tpu.ops.column_sparse import (
            columns_from_voxels,
            columns_to_dense_bev,
        )

        cols, x = jax.vmap(
            lambda f, a: columns_from_voxels(f, a, self.assume_sorted_voxels)
        )(features.astype(self.dtype), active)
        for f, mo in zip(self.stage_features, self.stage_max_voxels):
            for _ in range(self.subm_per_stage):
                x = SubMColumnLayer(
                    f, dtype=self.dtype, method=self.method,
                    norm_type=self.norm_type,
                )(x, cols)
            x, cols = StridedColumnLayer(
                f, max_out=mo, dtype=self.dtype, method=self.method,
                norm_type=self.norm_type,
            )(x, cols)
        return jax.vmap(columns_to_dense_bev)(x, cols), cols


class SubMUnitLayer(nn.Module):
    """Submanifold conv + norm + ReLU over z-slab units
    (``ops.column_sparse.subm_conv_units_batched``) — the
    occupancy-proportional refinement of ``SubMColumnLayer``."""

    features: int
    ncs: int  # slabs per column (invariant across stages)
    dtype: Any = jnp.bfloat16
    method: str = "auto"
    norm_type: str = "layer"
    t_tile: Any = None
    w_win: Any = None

    @nn.compact
    def __call__(self, colf, cols):
        from lyft3d_tpu.ops.column_sparse import subm_conv_units_batched

        cin = colf.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (27, cin, self.features), jnp.float32,
        ).astype(self.dtype)
        out = subm_conv_units_batched(
            colf.astype(self.dtype), cols, w, self.ncs, method=self.method,
            t_tile=self.t_tile, w_win=self.w_win,
        )
        return _column_norm_act(self, out, cols.mask, self.norm_type,
                                self.dtype)


class StridedUnitLayer(nn.Module):
    """Strided (k3 s2 p1) sparse conv over z-slab units → new unit set
    with halved slab size."""

    features: int
    ncs: int
    max_out: int
    dtype: Any = jnp.bfloat16
    method: str = "auto"
    norm_type: str = "layer"
    t_tile: int = 256
    w_win: int = 768

    @nn.compact
    def __call__(self, colf, cols):
        from lyft3d_tpu.ops.column_sparse import (
            downsample_units,
            strided_conv_units_batched,
        )

        cin = colf.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (27, cin, self.features), jnp.float32,
        ).astype(self.dtype)
        out_cols = jax.vmap(
            lambda c: downsample_units(c, self.ncs, self.max_out)
        )(cols)
        out, omask = strided_conv_units_batched(
            colf.astype(self.dtype), cols, out_cols, w, self.ncs,
            method=self.method, t_tile=self.t_tile, w_win=self.w_win,
        )
        out_cols = out_cols.replace(mask=omask)
        out = _column_norm_act(self, out, out_cols.mask, self.norm_type,
                               self.dtype)
        return out, out_cols


class SparseMiddleUnits(nn.Module):
    """SpMiddleFHD-style stack over z-slab units — the round-3 TPU default
    for the sparse middle (config ``middle: sparse_units``).

    Same semantics as ``SparseMiddleColumns`` (capability of
    ``second/second/pytorch/models/middle.py`` SpMiddleFHD:111-212), but
    only ACTIVE z-slabs of each BEV column are stored and convolved: at
    FHD occupancy (~1 voxel per column) this cuts per-layer work by
    ~nz/z_slab. ``z_slab`` is the stage-0 slab size and must be divisible
    by 2**(num stages − 1) so slabs halve exactly with each strided layer;
    caps bound UNITS per stage (units ≤ voxels, so reference voxel caps
    remain safe)."""

    stage_features: Sequence[int] = (16, 32, 64)
    stage_max_voxels: Sequence[int] = (8192, 4096, 2048)
    subm_per_stage: int = 2
    z_slab: int = 8
    dtype: Any = jnp.bfloat16
    method: str = "auto"
    norm_type: str = "layer"
    assume_sorted_voxels: bool = False

    @nn.compact
    def __call__(self, features, active: ActiveSet):
        from lyft3d_tpu.ops.column_sparse import (
            units_from_voxels,
            units_to_dense_bev,
        )

        nstages = len(self.stage_features)
        assert self.z_slab % (2 ** (nstages - 1)) == 0, (
            f"z_slab {self.z_slab} must halve across {nstages - 1} strided "
            "stages"
        )
        nz = active.spatial_shape[2]
        ncs = -(-nz // self.z_slab)
        cols, x = jax.vmap(
            lambda f, a: units_from_voxels(
                f, a, self.z_slab, self.assume_sorted_voxels
            )
        )(features.astype(self.dtype), active)
        nz_cur = nz
        for f, mo in zip(self.stage_features, self.stage_max_voxels):
            for _ in range(self.subm_per_stage):
                x = SubMUnitLayer(
                    f, ncs=ncs, dtype=self.dtype, method=self.method,
                    norm_type=self.norm_type,
                )(x, cols)
            x, cols = StridedUnitLayer(
                f, ncs=ncs, max_out=mo, dtype=self.dtype,
                method=self.method, norm_type=self.norm_type,
            )(x, cols)
            nz_cur = (nz_cur + 2 - 3) // 2 + 1
        return jax.vmap(
            lambda xx, cc: units_to_dense_bev(xx, cc, ncs, nz_cur)
        )(x, cols), cols


class SparseMiddle(nn.Module):
    """SpMiddleFHD-style stack: per stage, ``subm_per_stage`` submanifold
    convs then one strided downsample; final dense-BEV flatten.

    ``stage_features`` and ``stage_max_voxels`` size each stage; strides
    default to (2, 2, 2) per stage like the reference's ds_factor=8.

    REFERENCE IMPLEMENTATION: the per-voxel gather-einsum formulation is
    kept for A/B and equivalence testing (tests/test_column_sparse.py
    checks SparseMiddleColumns against it); the production sparse path is
    ``SparseMiddleUnits`` (config ``middle: sparse_units``), with
    ``SparseMiddleColumns`` as the intermediate dense-z formulation.
    """

    stage_features: Sequence[int] = (16, 32, 64)
    stage_max_voxels: Sequence[int] = (8192, 4096, 2048)
    subm_per_stage: int = 2
    strides: Sequence[Tuple[int, int, int]] = ((2, 2, 2), (2, 2, 2), (2, 2, 2))
    fused: str = "auto"  # subm layers: "auto" | "pallas" | "xla"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features, active: ActiveSet):
        from lyft3d_tpu.ops.sparse_conv import subm_neighbors

        x = features.astype(self.dtype)
        for f, mo, st in zip(self.stage_features, self.stage_max_voxels, self.strides):
            hash_ = build_hash(active)
            # One stencil match per stage, shared by every subm layer on
            # this active set.
            neighbors = subm_neighbors(active, hash_, kernel_offsets(3))
            for _ in range(self.subm_per_stage):
                x = SubMConvLayer(f, fused=self.fused, dtype=self.dtype)(
                    x, active, hash_, neighbors=neighbors
                )
            x, active = SparseConvLayer(
                f, max_out=mo, stride=st, dtype=self.dtype
            )(x, active)
        return sparse_to_dense_bev(x, active), active
