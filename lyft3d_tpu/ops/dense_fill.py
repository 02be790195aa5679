"""Dense-canvas fill from (row-id, feature-row) pairs.

The PointPillars BEV scatter (``second/second/pytorch/models/pointpillars.py
:421`` ``PointPillarsScatter``) and the sparse middle's ``.dense()`` flatten
(``middle.py:199-212``) both write V feature rows into a large dense canvas
at dynamic row ids. Measured on v5e (25k rows → 496²×64ch canvas, batch 8):

- plain ``.at[ids].add``:                        39.9 ms
- ``.at[ids].set`` + ``indices_are_sorted``:     19.1 ms  ← non-TPU fallback
- ``unique_indices`` alone:                      31.7 ms
- searchsorted-per-canvas-row + row gather:     304   ms  (searchsorted is
  catastrophic on TPU at canvas-row counts)
- factorized one-hot matmuls (per channel):      34.8 ms
- raw 246k-row gather (lower bound for any
  gather-side formulation):                      16.8 ms
- pallas tile-one-hot kernel (below, tile 1024): 10.0 ms  ← TPU default

Row-granular HBM access is the shared wall (~19 ms ≈ 116M rows/s); the
pallas kernel sidesteps it entirely with tile-local one-hot matmuls.
``voxelize`` / ``downsample_coords`` already emit ascending unique ids, so
the hot callers take the presorted path with no extra sort. Autodiff: the
kernel carries a custom VJP (backward = row gather of the cotangent).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fill_rows_by_id", "fill_rows_by_id_pallas"]


def fill_rows_by_id(features, row_ids, valid, num_rows: int,
                    assume_sorted: bool = False, method: str = "auto"):
    """(V, C) feature rows + (V,) ``row_ids`` → (num_rows, C) canvas.

    Rows not covered by a valid id are zero; invalid entries are dropped.
    Valid ids must be unique (the producer contract); with
    ``assume_sorted`` they must also be GLOBALLY non-decreasing with the
    invalid entries at the tail — partial stencil matchings (interspersed
    sentinels) violate this and must go through ``gather_by_rank`` instead.

    Args:
        assume_sorted: valid ``row_ids`` are ascending and invalid entries
            trail (the ``voxelize`` / ``downsample_coords`` contract) —
            skips the internal sort.
        method: "auto" (pallas kernel on TPU, hinted scatter elsewhere),
            "pallas", or "scatter".
    """
    v = features.shape[0]
    ids = jnp.where(valid, row_ids.astype(jnp.int32), num_rows)
    feats = features * valid[:, None].astype(features.dtype)
    if not assume_sorted:
        ids, src = jax.lax.sort((ids, jnp.arange(v, dtype=jnp.int32)), num_keys=1)
        feats = feats[src]
    if method == "auto":
        # The pallas kernel keeps the whole (n_tiles, tile) local-id array
        # VMEM-resident (see _fill_kernel) — cap the canvas so it fits, and
        # skip the one-hot matmul for narrow rows where the MXU is idle.
        fits = num_rows <= 2 ** 20 and features.shape[1] >= 8
        method = ("pallas" if jax.default_backend() == "tpu" and fits
                  else "scatter")
    if method == "pallas":
        ones = jnp.ones((v,), bool)  # ids already masked/sorted above
        return fill_rows_by_id_pallas(feats, ids, ones, num_rows)
    canvas = jnp.zeros((num_rows + 1, features.shape[1]), features.dtype)
    # All invalid entries share the sentinel row ``num_rows`` (in bounds),
    # so the indices are NOT unique — claiming unique_indices here would be
    # XLA-undefined; only the sorted hint is true.
    canvas = canvas.at[ids].set(feats, mode="drop", indices_are_sorted=True)
    return canvas[:num_rows]


def _fill_kernel(local_ref, feats_ref, out_ref):
    """One canvas row-tile: build the tile-local one-hot in VMEM and
    contract it with the tile's voxel-feature window on the MXU."""
    tile = out_ref.shape[0]
    t = pl.program_id(0)
    # local ids ride along as one full VMEM-resident (n_tiles, tile) array
    # (a (1, tile) block violates the 8-sublane block constraint).
    local = local_ref[t, :]  # (tile,) voxel slot → tile-local row (or OOB)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    onehot = (rows == local[None, :]).astype(feats_ref.dtype)  # [row, slot]
    out_ref[:] = jnp.dot(
        onehot, feats_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fill_rows_by_id_pallas(features, row_ids, valid, num_rows: int,
                           tile: int = 1024, interpret: bool = False):
    """Pallas canvas fill: (V, C) rows + ASCENDING ``row_ids`` →
    (num_rows, C).

    The XLA sorted-hint scatter (above) runs at row-granular speed
    (~19 ms for 25k → 496²×64 at batch 8). Here each grid step owns one
    ``tile``-row canvas block; its covering voxel window
    [starts[t], starts[t] + tile) — starts from one small searchsorted,
    windows pre-gathered by vmapped ``dynamic_slice`` (contiguous reads) —
    arrives as an aligned VMEM block, and the block output is one
    (tile × tile) one-hot matmul on the MXU. The one-hot never exists in
    HBM. Duplicate ids SUM (the reference scatter-add semantics). Requires
    ascending ids with invalid entries forced past ``num_rows`` (the
    ``voxelize`` / ``downsample_coords`` contract).
    """
    v, c = features.shape
    feats = features * valid[:, None].astype(features.dtype)
    ids = jnp.where(valid, row_ids.astype(jnp.int32), num_rows)
    n_tiles = -(-num_rows // tile)
    # Tile t covers rows [t·tile, (t+1)·tile): its voxels start at the
    # first id ≥ t·tile (ids ascending). n_tiles queries — searchsorted
    # is only pathological at canvas-row query counts.
    starts = jnp.searchsorted(
        ids, jnp.arange(n_tiles, dtype=jnp.int32) * tile
    ).astype(jnp.int32)
    # Per-tile windows; padding keeps every slice in bounds, sentinel ids
    # never match a tile-local row.
    ids_p = jnp.concatenate([ids, jnp.full((tile,), jnp.int32(2**30))])
    feats_p = jnp.concatenate(
        [feats, jnp.zeros((tile, c), feats.dtype)], axis=0
    )
    local = jax.vmap(
        lambda s, t: jax.lax.dynamic_slice(ids_p, (s,), (tile,)) - t * tile
    )(starts, jnp.arange(n_tiles, dtype=jnp.int32))  # (n_tiles, tile)
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(feats_p, (s, 0), (tile, c))
    )(starts)  # (n_tiles, tile, c)

    out = pl.pallas_call(
        _fill_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_tiles, tile), lambda t: (0, 0)),
            pl.BlockSpec((1, tile, c), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, c), feats.dtype),
        interpret=interpret,
    )(local, windows)
    return out[:num_rows]


def _fill_pallas_fwd(features, row_ids, valid, num_rows, tile, interpret):
    out = fill_rows_by_id_pallas(features, row_ids, valid, num_rows, tile,
                                 interpret)
    return out, (row_ids, valid)


def _fill_pallas_bwd(num_rows, tile, interpret, res, g):
    # out[row_ids[i]] += features[i]  ⇒  d features[i] = g[row_ids[i]]
    # (a V-row gather — the training path through the pillar scatter).
    row_ids, valid = res
    ids = jnp.clip(jnp.where(valid, row_ids.astype(jnp.int32), 0), 0,
                   num_rows - 1)
    gf = g[ids] * valid[:, None].astype(g.dtype)
    return (gf, None, None)


fill_rows_by_id_pallas.defvjp(_fill_pallas_fwd, _fill_pallas_bwd)
