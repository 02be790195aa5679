"""Dense-canvas fill from (row-id, feature-row) pairs.

The PointPillars BEV scatter (``second/second/pytorch/models/pointpillars.py
:421`` ``PointPillarsScatter``) and the sparse middle's ``.dense()`` flatten
(``middle.py:199-212``) both write V feature rows into a large dense canvas
at dynamic row ids. Measured on v5e (25k rows → 496²×64ch canvas, batch 8):

- plain ``.at[ids].add``:                        39.9 ms
- ``.at[ids].set`` + ``indices_are_sorted``:     19.1 ms  ← used here
- ``unique_indices`` alone:                      31.7 ms
- searchsorted-per-canvas-row + row gather:     304   ms  (searchsorted is
  catastrophic on TPU at canvas-row counts)
- factorized one-hot matmuls (per channel):      34.8 ms
- raw 246k-row gather (lower bound for any
  gather-side formulation):                      16.8 ms

Row-granular HBM access is the shared wall (~19 ms ≈ 116M rows/s); the
sorted-scatter hint halves the plain scatter and matches the gather bound.
``voxelize`` / ``downsample_coords`` already emit ascending unique ids, so
the hot callers take the presorted path with no extra sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fill_rows_by_id"]


def fill_rows_by_id(features, row_ids, valid, num_rows: int,
                    assume_sorted: bool = False):
    """(V, C) feature rows + (V,) ``row_ids`` → (num_rows, C) canvas.

    Rows not covered by a valid id are zero; invalid entries are dropped.
    Duplicate ids resolve to one winner (undefined which), not a sum —
    the producers emit unique ids, so this is tie-breaking only.

    Args:
        assume_sorted: valid ``row_ids`` are ascending and unique (the
            ``voxelize`` / ``downsample_coords`` contract) — skips the
            internal sort.
    """
    v = features.shape[0]
    ids = jnp.where(valid, row_ids.astype(jnp.int32), num_rows)
    feats = features * valid[:, None].astype(features.dtype)
    if not assume_sorted:
        ids, src = jax.lax.sort((ids, jnp.arange(v, dtype=jnp.int32)), num_keys=1)
        feats = feats[src]
    canvas = jnp.zeros((num_rows + 1, features.shape[1]), features.dtype)
    canvas = canvas.at[ids].set(
        feats, mode="drop", unique_indices=True, indices_are_sorted=True
    )
    return canvas[:num_rows]
