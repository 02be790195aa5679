"""Fused VMEM-resident neighbor-selection kernels (Pallas TPU).

The PointNet++ neighbor ops (ball query N2, 3-NN N4, RoI-pool3D N6 —
SURVEY.md §2.3) all reduce to: build a per-(query, point) key matrix and
select the k smallest keys per query row. The jnp formulations materialize
the (S, N) key matrix in HBM and run ``top_k``/``approx_min_k`` over it —
measured ~10x off the HBM roofline at Lyft scale (ball query 45 ms,
three_nn 59 ms, roi_pool3d 78 ms at batch 4 on v5e-1), because the matrix
makes three HBM round-trips (distance write, mask/key write, selector
read).

These kernels never materialize the matrix: a (R, N) key tile lives in
VMEM scratch (R = 128 query rows; 8 MB at N = 16384, within the ~16 MB
VMEM budget), and k smallest keys are extracted by iterative masked
min-reduction along lanes — k full-tile VPU passes, no sort, no HBM
traffic beyond the (3, N) points and (R, k) outputs.

Selection semantics per mode:
- ``first``: key = point index where (inside radius/box AND valid) —
  extraction yields the FIRST k members in index order, the CUDA ball
  query / roipool3d contract (``ball_query_gpu.cu``,
  ``roipool3d_kernel.cu``).
- ``nearest``: key = d2 where valid — extraction yields the k nearest
  points (``interpolate_gpu.cu`` 3-NN).

All kernels are unbatched (vmap over the sample axis at the caller — the
pallas vmap rule turns the batch into an outer grid dimension).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "ball_query_fused",
    "multi_radius_ball_query_fused",
    "knn_fused",
    "roi_inside_select_fused",
]

_ROWS = 64  # query rows per grid step: at N = 16384 the (R, N) f32
# distance tile and the loop-carried key tile are BOTH alive (4 MB each at
# R = 64), which must fit the ~16 MB scoped-VMEM budget with headroom —
# R = 128 OOMs at 17.6 MB.
_BIGK = 3.0e7  # > any point index or squared distance in range; f32-exact


def _extract_min_k(key, out_ref, cnt_ref, out_offset: int, k: int,
                   cnt_col: int, nearest: bool, n: int):
    """Pull the k smallest entries of ``key`` (R, N) per row into
    ``out_ref[:, out_offset:out_offset+k]`` by iterative masked
    min-extraction; count of sub-sentinel entries goes to
    ``cnt_ref[:, cnt_col]``. Returns nothing; mutates refs."""
    rows = key.shape[0]
    out_lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    cnt_lane = jax.lax.broadcasted_iota(jnp.int32, cnt_ref.shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1).astype(jnp.float32)

    cnt = jnp.sum((key < _BIGK).astype(jnp.float32), axis=1, keepdims=True)
    cnt_ref[:, :] = jnp.where(
        cnt_lane == cnt_col, cnt.astype(jnp.int32), cnt_ref[:, :]
    )

    def body(i, key):
        m = jnp.min(key, axis=1, keepdims=True)  # (R, 1)
        if nearest:
            # Key is d2; recover the argmin lane (lowest index on ties).
            # An exhausted row (m == _BIGK, fewer than k valid points)
            # must emit a MISS — every lane matches the sentinel min, so
            # the bare lane-min would return lane 0, a real index, and
            # the caller's d2 >= n guard would never fire.
            idx = jnp.min(jnp.where(key == m, lane, _BIGK), axis=1,
                          keepdims=True)
            idx = jnp.where(m >= _BIGK, jnp.float32(_BIGK), idx)
        else:
            # Key IS the point index.
            idx = m
        sel = jnp.where(idx >= _BIGK, jnp.float32(n), idx).astype(jnp.int32)
        out_ref[:, :] = jnp.where(
            out_lane == out_offset + i, sel, out_ref[:, :]
        )
        if nearest:
            return jnp.where(lane == idx, _BIGK, key)
        return jnp.where(key == m, _BIGK, key)

    jax.lax.fori_loop(0, k, body, key, unroll=False)


def _ball_kernel(pts_ref, centers_ref, valid_ref, out_ref, cnt_ref,
                 *, radii, nsamples, n):
    """pts (3, N); centers (R, 3); valid (1, N) int32;
    out (R, sum(nsamples)) int32; cnt (R, len(radii)) int32."""
    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    cx = centers_ref[:, 0:1]
    cy = centers_ref[:, 1:2]
    cz = centers_ref[:, 2:3]
    d2 = (cx - px) ** 2 + (cy - py) ** 2 + (cz - pz) ** 2  # (R, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1).astype(jnp.float32)
    ok_valid = valid_ref[0:1, :] > 0

    off = 0
    for j, (r, k) in enumerate(zip(radii, nsamples)):
        key = jnp.where((d2 < r * r) & ok_valid, lane, _BIGK)
        _extract_min_k(key, out_ref, cnt_ref, off, k, j, nearest=False, n=n)
        off += k


def _knn_kernel(pts_ref, centers_ref, valid_ref, out_ref, cnt_ref, *, k, n):
    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    cx = centers_ref[:, 0:1]
    cy = centers_ref[:, 1:2]
    cz = centers_ref[:, 2:3]
    d2 = (cx - px) ** 2 + (cy - py) ** 2 + (cz - pz) ** 2
    key = jnp.where(valid_ref[0:1, :] > 0, d2, _BIGK)
    _extract_min_k(key, out_ref, cnt_ref, 0, k, 0, nearest=True, n=n)


def _roi_kernel(pts_ref, boxes_ref, valid_ref, out_ref, cnt_ref,
                *, k, extra, n):
    """boxes (R, 7) [x y z w l h yaw], z at box center; first-k points
    inside the (enlarged) rotated box."""
    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    bx = boxes_ref[:, 0:1]
    by = boxes_ref[:, 1:2]
    bz = boxes_ref[:, 2:3]
    hw = boxes_ref[:, 3:4] / 2 + extra
    hl = boxes_ref[:, 4:5] / 2 + extra
    hh = boxes_ref[:, 5:6] / 2 + extra
    yaw = boxes_ref[:, 6:7]
    dx = px - bx
    dy = py - by
    dz = pz - bz
    c = jnp.cos(yaw)
    s = jnp.sin(yaw)
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    inside = (
        (jnp.abs(lx) <= hl) & (jnp.abs(ly) <= hw) & (jnp.abs(dz) <= hh)
        & (valid_ref[0:1, :] > 0)
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, inside.shape, 1).astype(jnp.float32)
    key = jnp.where(inside, lane, _BIGK)
    _extract_min_k(key, out_ref, cnt_ref, 0, k, 0, nearest=False, n=n)


def _pad_rows(x, rows):
    pad = (-x.shape[0]) % rows
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, x.shape[0]


def _run(kernel, queries, points, valid, ktot, ncnt, interpret):
    """Shared pallas_call driver: queries (S, Q) row-chunked over the grid,
    points (N, 3) + valid (N,) broadcast to every chunk."""
    n = points.shape[0]
    q, s_pad = _pad_rows(queries.astype(jnp.float32), _ROWS)
    pts_t = points[:, :3].T.astype(jnp.float32)  # (3, N)
    valid_i = valid.astype(jnp.int32)[None, :]  # (1, N)
    grid = (s_pad // _ROWS,)
    out, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((s_pad, ktot), jnp.int32),
            jax.ShapeDtypeStruct((s_pad, ncnt), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((3, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, q.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROWS, ktot), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, ncnt), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pts_t, q, valid_i)
    return out, cnt


def _postprocess_first_k(idx, count, k, n):
    """Sentinel handling identical to ``pointnet2._first_k_true``: missing
    slots repeat the first member; fully-empty rows -> 0."""
    count = jnp.minimum(count, k)
    first = idx[..., :1]
    idx = jnp.where(idx >= n, jnp.maximum(first, 0), idx)
    idx = jnp.where(idx >= n, 0, idx)
    return idx, count


def multi_radius_ball_query_fused(centers, points, valid, radii, nsamples,
                                  interpret: bool = False):
    """Fused multi-radius ball query; contract of
    ``pointnet2.multi_radius_ball_query`` (one shared distance tile, all
    radii selected in-kernel). Returns [(idx (S, k), count (S,)), ...]."""
    n = points.shape[0]
    s = centers.shape[0]
    ktot = int(sum(nsamples))
    kern = functools.partial(
        _ball_kernel, radii=tuple(float(r) for r in radii),
        nsamples=tuple(int(k) for k in nsamples), n=n,
    )
    out, cnt = _run(kern, centers, points, valid, ktot, len(radii), interpret)
    res = []
    off = 0
    for j, k in enumerate(nsamples):
        idx, count = _postprocess_first_k(
            out[:s, off:off + k], cnt[:s, j], k, n
        )
        res.append((idx, count))
        off += k
    return res


def ball_query_fused(centers, points, valid, radius, nsample,
                     interpret: bool = False):
    """Single-radius fused ball query (``pointnet2.ball_query`` contract)."""
    return multi_radius_ball_query_fused(
        centers, points, valid, (radius,), (nsample,), interpret=interpret
    )[0]


def knn_fused(unknown, known, known_valid, k: int = 3,
              interpret: bool = False):
    """Fused k-NN (``pointnet2.three_nn`` contract for k=3): returns
    (dists (S, k), idx (S, k)). Distances are recomputed exactly from the
    gathered neighbors (cheap (S, k) work) rather than stored."""
    n = known.shape[0]
    s = unknown.shape[0]
    kern = functools.partial(_knn_kernel, k=k, n=n)
    out, cnt = _run(kern, unknown, known, known_valid, k, 1, interpret)
    idx = jnp.minimum(out[:s], n - 1)
    d2 = jnp.sum((unknown[:, None, :] - known[idx]) ** 2, axis=-1)
    d2 = jnp.where(out[:s] >= n, 1e10, d2)
    return jnp.sqrt(jnp.maximum(d2, 0.0)), idx.astype(jnp.int32)


def roi_inside_select_fused(points, valid, boxes, num_sampled: int,
                            extra_width: float = 0.0,
                            interpret: bool = False):
    """Fused point-in-rotated-box first-k selection (the selection half of
    ``pointnet2.roi_pool3d``). Returns (idx (R, num_sampled), count (R,))."""
    n = points.shape[0]
    r = boxes.shape[0]
    kern = functools.partial(
        _roi_kernel, k=num_sampled, extra=float(extra_width), n=n
    )
    out, cnt = _run(kern, boxes, points, valid, num_sampled, 1, interpret)
    return _postprocess_first_k(out[:r], cnt[:r, 0], num_sampled, n)
