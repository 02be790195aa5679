"""Lidar → BEV voxel-count rasterization, on device.

Capability of the reference's numpy rasterizer
(``generating-dataset/generating_train_bev.py``:
``create_transformation_matrix_to_voxel_space:47``,
``create_voxel_pointcloud:84`` — per-sample 4x4 matmul + integer cast +
bounds mask + np.unique count scatter; ``normalize_voxel_intensities:103``;
``draw_boxes:127``), re-designed TPU-first:

Three equivalent formulations of the count scatter, verified against each
other in tests:

1. ``bev_rasterize_scatter`` — XLA scatter-add (``.at[].add``): the obvious
   formulation; fine on CPU, serialized-ish on TPU.
2. ``bev_rasterize_matmul`` — the MXU formulation: for a chunk of points,
   ``one_hot(rows)ᵀ @ one_hot(cols·C + ch)`` IS the scatter-add of ones.
   The whole rasterization becomes a stream of (H, P) × (P, W·C) matmuls —
   pure systolic-array work, no scatter at all.
3. ``bev_rasterize_pallas`` — the same one-hot-matmul, fused in a Pallas
   kernel: one grid step per point chunk, one-hots built in VMEM (never
   touching HBM), accumulated into a resident (H, W·C) f32 VMEM tile.

Targets (class-index polygon fill replacing ``cv2.drawContours``) are a
dense point-in-quad test over the pixel grid — O(pixels × boxes) vector ops,
no contour walking.

All functions take fixed-capacity padded point buffers + a valid mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "voxel_indices",
    "bev_rasterize_scatter",
    "bev_rasterize_matmul",
    "bev_rasterize_pallas",
    "bev_rasterize",
    "normalize_bev",
    "rasterize_boxes_bev",
]

# Lyft BEV defaults (generating_train_bev.py:37-42).
DEFAULT_SHAPE = (336, 336, 3)
DEFAULT_VOXEL_SIZE = (0.4, 0.4, 1.5)
DEFAULT_Z_OFFSET = -2.0
MAX_INTENSITY = 16.0


def voxel_indices(points, shape, voxel_size, z_offset):
    """Points (N, ≥3) in ego frame → (row, col, ch) voxel indices + in-bounds mask.

    Grid convention: BEV row = y voxel (ego ahead-left up the image), col = x
    voxel, channel = z slab above ``z_offset`` — behaviorally identical to
    the reference's transform + swapped scatter
    (``bev[coord[:,1], coord[:,0], coord[:,2]]``).
    """
    h, w, c = shape
    vx, vy, vz = voxel_size
    col = jnp.floor(points[:, 0] / vx + w / 2.0).astype(jnp.int32)
    row = jnp.floor(points[:, 1] / vy + h / 2.0).astype(jnp.int32)
    ch = jnp.floor((points[:, 2] - z_offset) / vz).astype(jnp.int32)
    inb = (col >= 0) & (col < w) & (row >= 0) & (row < h) & (ch >= 0) & (ch < c)
    return row, col, ch, inb


def bev_rasterize_scatter(
    points,
    valid,
    shape: Tuple[int, int, int] = DEFAULT_SHAPE,
    voxel_size=DEFAULT_VOXEL_SIZE,
    z_offset: float = DEFAULT_Z_OFFSET,
):
    """Scatter-add formulation → (H, W, C) float32 counts."""
    h, w, c = shape
    row, col, ch, inb = voxel_indices(points, shape, voxel_size, z_offset)
    ok = inb & valid
    flat = (row * w + col) * c + ch
    flat = jnp.where(ok, flat, h * w * c)  # dropped
    counts = jnp.zeros((h * w * c,), jnp.float32).at[flat].add(
        jnp.where(ok, 1.0, 0.0), mode="drop"
    )
    return counts.reshape(h, w, c)


def _onehot_chunk_counts(row, colch, ok, h, wc):
    """(P,) indices → (H, W·C) counts via one-hot outer-product matmul."""
    p = row.shape[0]
    rows_oh = (row[:, None] == jax.lax.broadcasted_iota(jnp.int32, (p, h), 1)) & ok[
        :, None
    ]
    cols_oh = colch[:, None] == jax.lax.broadcasted_iota(jnp.int32, (p, wc), 1)
    return jax.lax.dot_general(
        rows_oh.astype(jnp.bfloat16),
        cols_oh.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def bev_rasterize_matmul(
    points,
    valid,
    shape: Tuple[int, int, int] = DEFAULT_SHAPE,
    voxel_size=DEFAULT_VOXEL_SIZE,
    z_offset: float = DEFAULT_Z_OFFSET,
    chunk: int = 2048,
):
    """MXU formulation: scan over point chunks of one-hot outer products."""
    h, w, c = shape
    n = points.shape[0]
    pad = (-n) % chunk
    if pad:
        points = jnp.pad(points, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    row, col, ch, inb = voxel_indices(points, shape, voxel_size, z_offset)
    ok = inb & valid
    colch = col * c + ch
    num_chunks = (n + pad) // chunk

    def body(acc, args):
        r, cc, o = args
        return acc + _onehot_chunk_counts(r, cc, o, h, w * c), None

    # The zero carry must inherit the inputs' varying-manual-axes type or
    # scan rejects the carry under shard_map (point-sharded raster path).
    acc0 = jnp.zeros((h, w * c), jnp.float32) + 0.0 * row[0].astype(jnp.float32)
    acc, _ = jax.lax.scan(
        body,
        acc0,
        (
            row.reshape(num_chunks, chunk),
            colch.reshape(num_chunks, chunk),
            ok.reshape(num_chunks, chunk),
        ),
    )
    return acc.reshape(h, w, c)


def _raster_kernel(row_ref, colch_ref, ok_ref, out_ref, acc_ref):
    """Pallas kernel: accumulate one chunk's one-hot matmul into VMEM."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p, h = row_ref.shape[0], acc_ref.shape[0]
    wc = acc_ref.shape[1]
    row = row_ref[:]
    colch = colch_ref[:]
    ok = ok_ref[:] != 0

    rows_oh = (
        (row[:, None] == jax.lax.broadcasted_iota(jnp.int32, (p, h), 1))
        & ok[:, None]
    ).astype(jnp.bfloat16)
    cols_oh = (
        colch[:, None] == jax.lax.broadcasted_iota(jnp.int32, (p, wc), 1)
    ).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        rows_oh,
        cols_oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def bev_rasterize_pallas(
    points,
    valid,
    shape: Tuple[int, int, int] = DEFAULT_SHAPE,
    voxel_size=DEFAULT_VOXEL_SIZE,
    z_offset: float = DEFAULT_Z_OFFSET,
    chunk: int = 1024,
):
    """Fused Pallas kernel: one-hots live only in VMEM, accumulator resident."""
    h, w, c = shape
    n = points.shape[0]
    pad = (-n) % chunk
    if pad:
        points = jnp.pad(points, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    row, col, ch, inb = voxel_indices(points, shape, voxel_size, z_offset)
    ok = (inb & valid).astype(jnp.int32)
    colch = col * c + ch
    num_chunks = (n + pad) // chunk

    out = pl.pallas_call(
        _raster_kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, w * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w * c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w * c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * chunk * h * (w * c),
            bytes_accessed=(n + pad) * 12 + h * w * c * 4,
            transcendentals=0,
        ),
    )(row, colch, ok)
    return out.reshape(h, w, c)


def bev_rasterize_sort(
    points,
    valid,
    shape: Tuple[int, int, int] = DEFAULT_SHAPE,
    voxel_size=DEFAULT_VOXEL_SIZE,
    z_offset: float = DEFAULT_Z_OFFSET,
):
    """Sort-histogram formulation: sort the N flat cell ids once, then each
    cell's count is the difference of two binary searches. O(N log N) total —
    no N×cells matmul FLOPs, no serialized scatter; the fastest variant for
    large grids."""
    h, w, c = shape
    n = points.shape[0]
    ncells = h * w * c
    row, col, ch, inb = voxel_indices(points, shape, voxel_size, z_offset)
    ok = inb & valid
    flat = jnp.where(ok, (row * w + col) * c + ch, ncells)
    sorted_ids = jnp.sort(flat)
    bounds = jnp.searchsorted(sorted_ids, jnp.arange(ncells + 1, dtype=jnp.int32))
    counts = (bounds[1:] - bounds[:-1]).astype(jnp.float32)
    return counts.reshape(h, w, c)


def bev_rasterize(points, valid, shape=DEFAULT_SHAPE, voxel_size=DEFAULT_VOXEL_SIZE,
                  z_offset=DEFAULT_Z_OFFSET, backend: str = "auto"):
    """Dispatch. Measured on v5e (batch 8 × 65k pts, 336² grid): matmul
    1.9 ms, scatter 4.1 ms, sort-histogram 343 ms (searchsorted lowers
    poorly) — the MXU one-hot formulation wins on TPU; scatter elsewhere."""
    if backend == "auto":
        backend = "matmul" if jax.default_backend() == "tpu" else "scatter"
    fn = {
        "scatter": bev_rasterize_scatter,
        "matmul": bev_rasterize_matmul,
        "pallas": bev_rasterize_pallas,
        "sort": bev_rasterize_sort,
    }[backend]
    return fn(points, valid, shape, voxel_size, z_offset)


def normalize_bev(counts, max_intensity: float = MAX_INTENSITY):
    """Counts → [0, 1] intensities (normalize_voxel_intensities:103)."""
    return jnp.clip(counts / max_intensity, 0.0, 1.0)


def rasterize_boxes_bev(
    corners_px,
    classes,
    valid,
    shape: Tuple[int, int] = (336, 336),
):
    """Fill rotated-box quads with class indices on the pixel grid.

    Replaces the reference's per-box ``cv2.drawContours`` loop
    (``draw_boxes:127-139``) with one dense point-in-quad test: a pixel gets
    the class of the highest-indexed valid box containing it (matching
    "later draw overwrites"), else 0 (background).

    Args:
        corners_px: (B, 4, 2) box corners in (col, row) pixel coords, CCW.
        classes: (B,) int class indices (1-based; 0 = background).
        valid: (B,) bool.
        shape: (H, W).

    Returns:
        (H, W) int32 class map.
    """
    h, w = shape
    bnum = corners_px.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    px = jnp.stack([cols, rows], axis=-1).reshape(h * w, 2)  # (P, 2)

    a = corners_px  # (B, 4, 2)
    b = jnp.roll(corners_px, -1, axis=1)
    edge = b - a  # (B, 4, 2)

    # signed side of each pixel vs each edge: (B, 4, P)
    rel = px[None, None, :, :] - a[:, :, None, :]
    cross = edge[:, :, None, 0] * rel[..., 1] - edge[:, :, None, 1] * rel[..., 0]
    inside = jnp.all(cross >= 0.0, axis=1) | jnp.all(cross <= 0.0, axis=1)  # (B, P)
    inside = inside & valid[:, None]

    box_rank = jnp.arange(1, bnum + 1, dtype=jnp.int32)[:, None]
    winner = jnp.max(jnp.where(inside, box_rank, 0), axis=0)  # (P,) 0 = none
    cls_of = jnp.concatenate([jnp.zeros(1, jnp.int32), classes.astype(jnp.int32)])
    return cls_of[winner].reshape(h, w)
