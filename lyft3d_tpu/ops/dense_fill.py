"""Scatter-free dense-canvas fill from (row-id, feature-row) pairs.

The PointPillars BEV scatter (``second/second/pytorch/models/pointpillars.py
:421`` ``PointPillarsScatter``) and the sparse middle's ``.dense()`` flatten
(``middle.py:199-212``) both write V feature rows into a large dense canvas
at dynamic row ids. On TPU an XLA scatter serializes per update row, so the
canvas is instead built gather-side: sort the (id, source-row) pairs (V
elements — tiny next to the canvas), binary-search each canvas row's id in
the sorted list (searchsorted of an arange), and read the matching feature
row with one gather. Duplicate ids resolve to one winner (first in sorted
order) rather than scatter-add's sum — producers (``voxelize``,
``downsample_coords``) emit unique ids, so this is tie-breaking only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fill_rows_by_id"]


def fill_rows_by_id(features, row_ids, valid, num_rows: int):
    """(V, C) feature rows + (V,) ``row_ids`` → (num_rows, C) canvas.

    Rows not covered by a valid id are zero; invalid entries' ids are
    ignored.
    """
    v = features.shape[0]
    ids = jnp.where(valid, row_ids.astype(jnp.int32), num_rows)
    sids, src = jax.lax.sort(
        (ids, jnp.arange(v, dtype=jnp.int32)), num_keys=1
    )
    q = jnp.arange(num_rows, dtype=jnp.int32)
    pos = jnp.searchsorted(sids, q)
    posc = jnp.minimum(pos, v - 1)
    hit = sids[posc] == q
    return features[src[posc]] * hit[:, None].astype(features.dtype)
