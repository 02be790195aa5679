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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "furthest_point_sample",
    "fps",
    "fps_pallas",
    "ball_query",
    "multi_radius_ball_query",
    "grid_multi_radius_ball_query",
    "group_points",
    "three_nn",
    "three_interpolate",
    "roi_pool3d",
]

_BIG = 1e10

# Row length above which first-k / k-NN selections switch from exact
# ``lax.top_k`` (an O(N·k)-ish sort path that measured 247 ms at the
# (4, 4096, 16384) k=32 stage-0 ball-query shape on v5e-1) to the
# TPU-native ``lax.approx_min_k`` PartialReduce (35 ms, 7x; at the RCNN
# encoder's (51200, 512) k=64 shape the gap is 17x — 29 -> 1.7 ms).
# Approximation is safe here: a missed in-radius neighbor only swaps
# which member pads the group before max-pooling, and the sentinel/empty
# handling below is unchanged. Small (test) shapes stay exact.
# Env override LYFT3D_APPROX_MIN_N (e.g. 10**9 forces the exact path
# everywhere — used by the exact-vs-approx accuracy A/B).
import os as _os

_APPROX_MIN_N = int(_os.environ.get("LYFT3D_APPROX_MIN_N", 512))

# Lane-interleave pitch for the approx path. approx_min_k's recall
# guarantee assumes the true top-k spread ~uniformly across lanes, but
# our keys are POINT INDICES and the in-radius neighbors of a center are
# index-CLUSTERED in scan-/sort-ordered clouds — a cluster lands in one
# PartialReduce bin and all but ~one member are lost. A (n/g, g) ->
# (g, n/g) transpose (a layout op, values stay original indices) helps
# contiguous clusters but NOT strided ones: measured on v5e-1 at the
# (4096, 16384) k=32 stage-0 shape (scripts/measure_approx_recall.py,
# interleaved): mean recall 0.95 uniform / 0.63 sorted / 0.19
# scan-ordered. approx_min_k is therefore NOT trusted for ball-query
# selection — the production ball query / RoI select dispatch to the
# EXACT fused VMEM kernels (ops.select_kernel) on TPU instead, and this
# approx path survives only as the fallback for shapes the fused
# kernels cannot hold in VMEM.
_INTERLEAVE_G = 128

# Above this source-point count the fused kernels' (R, N) VMEM key tile
# no longer fits (see ops/select_kernel.py _ROWS sizing note).
_FUSED_MAX_N = 65536


def _use_approx(n: int) -> bool:
    return jax.default_backend() == "tpu" and n >= _APPROX_MIN_N


def _use_fused(n: int) -> bool:
    return (jax.default_backend() == "tpu" and _APPROX_MIN_N <= n
            <= _FUSED_MAX_N)


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
    """Pallas FPS: pts (3·8, C) VMEM (x rows 0..7, y 8..15, z 16..23),
    valid (8, C), out (1, npoint) int32.

    Vector-only formulation — Mosaic supports neither scalar VMEM stores
    nor dynamic-lane scalar loads, so the selected point's coordinates are
    read with a masked reduction and the output slot written with a masked
    full-row rewrite; argmax runs on f32 (the only dtype Mosaic lowers).
    Point index i lives at row-major position (i // C, i % C) of the
    (8, C) plane, so flat argmax indices ARE point indices. The (8, C)
    packing fills whole vregs (8 sublanes x 128 lanes); a (1, N) row would
    waste 7/8 of each vector register.

    Tie-breaking on real hardware follows Mosaic's reduction order, which
    need not be "lowest index" — any argmax among tied distances is a
    valid FPS; interpret mode matches the jnp formulation exactly.
    """
    npoint = out_ref.shape[1]
    validf = valid_ref[:, :].astype(jnp.float32)  # (8, C)
    rows, cols = validf.shape
    flatidx = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) * cols
        + jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    )
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)
    n = rows * cols
    # First valid index, deterministically (argmax alone would tie across
    # every valid lane on hardware): highest key = lowest valid index.
    start = jnp.argmax(validf * (n - flatidx).astype(jnp.float32)).astype(
        jnp.int32
    )
    out_ref[:, :] = jnp.where(out_lane == 0, start, 0)
    dist_ref[:, :] = jnp.where(validf > 0, _BIG, -1.0)

    def body(i, last):
        sel = flatidx == last
        x = pts_ref[0:rows, :]
        y = pts_ref[rows : 2 * rows, :]
        z = pts_ref[2 * rows : 3 * rows, :]
        px = jnp.sum(jnp.where(sel, x, 0.0))
        py = jnp.sum(jnp.where(sel, y, 0.0))
        pz = jnp.sum(jnp.where(sel, z, 0.0))
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        nd = jnp.minimum(dist_ref[:, :], jnp.where(validf > 0, d, -1.0))
        dist_ref[:, :] = nd
        nxt = jnp.argmax(nd).astype(jnp.int32)
        out_ref[:, :] = jnp.where(out_lane == i, nxt, out_ref[:, :])
        return nxt

    jax.lax.fori_loop(1, npoint, body, start)


def fps_pallas(points, valid, npoint: int, interpret: bool = False):
    """Pallas TPU FPS; same contract as :func:`furthest_point_sample`
    (up to argmax tie-breaking on real hardware — see `_fps_kernel`)."""
    n = points.shape[0]
    # Pad to a multiple of 8*128 and pack row-major into (8, C) planes so
    # every vreg is full; padded entries are invalid (dist -1, never picked).
    pad = (-n) % (8 * 128)
    pts_t = points.T.astype(jnp.float32)  # (3, N)
    if pad:
        pts_t = jnp.pad(pts_t, ((0, 0), (0, pad)))
    valid_i = jnp.pad(valid.astype(jnp.int32), (0, pad))
    cols = (n + pad) // 8
    out = pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((1, npoint), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, cols), jnp.float32)],
        interpret=interpret,
    )(pts_t.reshape(24, cols), valid_i.reshape(8, cols))
    return out[0]


def fps(points, valid, npoint: int):
    """Backend-dispatching FPS: the VMEM-resident Pallas kernel on TPU for
    large inputs (v5e-1: 2.3 vs 26.8 ms at 16384→4096, 0.43 vs 3.2 ms at
    4096→1024), the pure-jnp fori_loop otherwise — below ~4k points the
    kernel's fixed launch overhead loses (0.56 vs 0.22 ms at 1024→256),
    including every vmapped small-RoI instance in the RCNN encoder."""
    if jax.default_backend() == "tpu" and points.shape[0] >= 4096:
        return fps_pallas(points, valid, npoint)
    return furthest_point_sample(points, valid, npoint)


def _first_k_true(mask, k: int):
    """Indices of the first k True entries per row, plus found-count.

    mask: (..., N). Returns (idx (..., k) int32, count (...,)). Missing slots
    repeat the first found index (pointnet2 ball-query padding), or 0 if the
    row is empty.
    """
    n = mask.shape[-1]
    # "First k true indices" as a top-k problem: key = index where true,
    # sentinel n where false; the k smallest keys are exactly the first k
    # true indices in ascending order. Large rows use the TPU PartialReduce
    # (``approx_min_k``, see _APPROX_MIN_N); small rows the exact TopK.
    kk = min(k, n)
    if _use_approx(n):
        keyf = jnp.where(mask, jnp.arange(n, dtype=jnp.float32),
                         jnp.float32(n))
        # Interleave the LANE LAYOUT (transpose, not gather) so
        # index-clustered true top-k spread across the PartialReduce
        # bins; values stay original indices (see _INTERLEAVE_G note).
        g = _INTERLEAVE_G
        pad = (-n) % g
        if pad:
            keyf = jnp.concatenate(
                [keyf, jnp.full(keyf.shape[:-1] + (pad,), float(n),
                                jnp.float32)], axis=-1)
        npad = n + pad
        keyt = keyf.reshape(keyf.shape[:-1] + (npad // g, g))
        keyt = jnp.swapaxes(keyt, -1, -2).reshape(keyf.shape[:-1] + (npad,))
        outf, _ = jax.lax.approx_min_k(keyt, kk)
        out = outf.astype(jnp.int32)
    else:
        key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
        neg, _ = jax.lax.top_k(-key, kk)
        out = -neg  # ascending first-k true indices, padded with n
    if kk < k:  # capacity exceeds row length: pad with the sentinel
        pad = jnp.full(out.shape[:-1] + (k - kk,), n, out.dtype)
        out = jnp.concatenate([out, pad], axis=-1)
    count = jnp.minimum(jnp.sum(mask, axis=-1), k)
    first = out[..., :1]
    out = jnp.where(out >= n, jnp.maximum(first, 0), out)
    out = jnp.where(out >= n, 0, out)  # fully-empty rows -> 0
    return out.astype(jnp.int32), count


def ball_query(centers, points, valid, radius: float, nsample: int):
    """(S, 3) centers × (N, 3) points → (S, nsample) indices + (S,) counts
    (ball_query_gpu.cu capability: ≤ nsample points within radius, padded by
    repeating the first hit). Large TPU shapes run the EXACT fused VMEM
    kernel (approx_min_k's recall collapses on index-clustered in-radius
    sets — see the _INTERLEAVE_G note)."""
    if _use_fused(points.shape[0]):
        from lyft3d_tpu.ops.select_kernel import ball_query_fused

        return ball_query_fused(centers, points, valid, radius, nsample)
    d2 = jnp.sum((centers[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    mask = (d2 < radius * radius) & valid[None, :]
    return _first_k_true(mask, nsample)


def multi_radius_ball_query(centers, points, valid, radii, nsamples):
    """Ball query at several radii over ONE shared (S, N) distance matrix.

    The MSG set-abstraction modules query the same centers at 2 radii
    (``pointnet2_modules.py:58`` loops the CUDA ball query per radius); the
    (S, N) pairwise d2 is the bandwidth-dominant part at stage-0 scale
    (~27 ms of a 35 ms query at (4096, 16384) on v5e-1), so computing it
    once and running only the per-radius mask + first-k selection again
    roughly halves the 2-radius cost. Returns [(idx, count), ...].
    """
    # Dispatch note (r5): the fused VMEM kernel and the shared-d2 +
    # approx_min_k formulation measured within ~20% of each other at the
    # stage-0 shape (v5e-1, batch 4), but approx_min_k's recall collapses
    # on index-clustered in-radius sets (mean 0.19 on scan-ordered clouds
    # at (4096, 16384) k=32 — scripts/measure_approx_recall.py), so the
    # EXACT kernel is the TPU path and approx survives only beyond the
    # kernel's VMEM bound.
    if _use_fused(points.shape[0]):
        from lyft3d_tpu.ops.select_kernel import (
            multi_radius_ball_query_fused,
        )

        return multi_radius_ball_query_fused(
            centers, points, valid, tuple(radii), tuple(nsamples)
        )
    d2 = jnp.sum((centers[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    out = []
    for radius, nsample in zip(radii, nsamples):
        mask = (d2 < radius * radius) & valid[None, :]
        out.append(_first_k_true(mask, nsample))
    return out


def grid_multi_radius_ball_query(centers, points, valid, radii, nsamples,
                                 bounds, plane=(0, 2), cell_cap: int = 16,
                                 max_grid: int = 256):
    """Bucketed multi-radius ball query — O(S·9·cap) instead of O(S·N).

    Points are binned into square cells of size max(radii) on the
    ``plane`` axes (KITTI-rect clouds are flat in (x, z)); every true
    neighbor within any radius then lies in the 3x3 cell neighborhood of
    its center's cell. Per (stage, radius) the candidate set shrinks from
    N (16384 at the Lyft stage-0 shape) to 9·cell_cap (144), and the
    selection runs exact `top_k` over that short row with keys = ORIGINAL
    point indices, so the result is the reference's first-k-by-index
    contract (`ball_query_gpu.cu`) over the candidate set.

    TPU-shaped: the bucket table is built by one (cell, rank) sort + four
    scalar scatters, and candidates are fetched as (S·9) WIDE-ROW gathers
    of (cap·4)-wide table rows — scalar gathers at S·9·cap scale would run
    XLA:TPU's serial path (~45 µs/1k, measured), row gathers ~10x faster.

    Approximation bound: a cell holding more than ``cell_cap`` points
    drops the index-largest overflow (at Lyft densities: 16384 points
    over ≥160² cells ≈ 0.6/cell mean — overflow needs a >25x local
    hotspot). Dropped points are exactly the ones first-k-by-index would
    have skipped anyway unless the cell has < nsample survivors.

    Args:
        bounds: ((lo_a, hi_a), (lo_b, hi_b)) static extents of the two
            ``plane`` axes; out-of-bounds coords clip to edge cells
            (convex hull ⇒ the 3x3 cover stays valid).
        max_grid: cap on cells per axis (cell grows beyond max(radii) if
            the span demands it — coverage is preserved since cell size
            only ever grows).
    Returns [(idx (S, k), count (S,)), ...] — the
    :func:`multi_radius_ball_query` contract.
    """
    n = points.shape[0]
    s = centers.shape[0]
    a, b = plane
    (lo_a, hi_a), (lo_b, hi_b) = bounds
    cell = max(float(max(radii)),
               max(hi_a - lo_a, hi_b - lo_b) / max_grid)
    nga = max(int(np.ceil((hi_a - lo_a) / cell)), 1)
    ngb = max(int(np.ceil((hi_b - lo_b) / cell)), 1)
    ncells = nga * ngb

    def cell_of(xy_a, xy_b):
        ca = jnp.clip(jnp.floor((xy_a - lo_a) / cell).astype(jnp.int32),
                      0, nga - 1)
        cb = jnp.clip(jnp.floor((xy_b - lo_b) / cell).astype(jnp.int32),
                      0, ngb - 1)
        return ca, cb

    pa, pb = cell_of(points[:, a], points[:, b])
    pcell = jnp.where(valid, pb * nga + pa, jnp.int32(ncells))
    scell, sidx = jax.lax.sort(
        (pcell, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    head = jnp.concatenate(
        [jnp.ones((1,), bool), scell[1:] != scell[:-1]]
    ) & (scell < ncells)
    pos = jnp.arange(n, dtype=jnp.int32)
    rank = pos - jax.lax.cummax(jnp.where(head, pos, -1))
    dest = jnp.where(
        (scell < ncells) & (rank < cell_cap), scell * cell_cap + rank,
        jnp.int32(ncells * cell_cap),
    )
    spts = points[sidx]
    # Four scalar scatters (x, y, z, idx-as-f32 — exact to 2^24 ≫ n);
    # a (cap·4)-wide ROW scatter at n rows measured ~4x slower.
    tx = [
        jnp.full((ncells * cell_cap,),
                 float(n) if ch == 3 else 0.0, jnp.float32)
        .at[dest].set(v.astype(jnp.float32), mode="drop",
                      unique_indices=True)
        for ch, v in enumerate(
            (spts[:, 0], spts[:, 1], spts[:, 2], sidx.astype(jnp.float32))
        )
    ]
    table = jnp.stack(tx, axis=-1).reshape(ncells, cell_cap * 4)
    table = jnp.concatenate(  # sentinel row for out-of-bounds neighbors
        [table, jnp.tile(jnp.asarray([[0.0, 0.0, 0.0, float(n)]],
                                     jnp.float32), (1, cell_cap))], axis=0
    )

    ca, cb = cell_of(centers[:, a], centers[:, b])
    offs = jnp.asarray(
        [(da, db) for db in (-1, 0, 1) for da in (-1, 0, 1)], jnp.int32
    )
    na = ca[:, None] + offs[None, :, 0]
    nb = cb[:, None] + offs[None, :, 1]
    okc = (na >= 0) & (na < nga) & (nb >= 0) & (nb < ngb)
    cells9 = jnp.where(okc, nb * nga + na, ncells)  # (S, 9)
    rows9 = table[cells9]  # (S, 9, cap*4) wide-row gather
    cand = rows9.reshape(s, 9 * cell_cap, 4)
    cxyz = cand[..., :3]
    cidx = cand[..., 3]
    d2 = jnp.sum((cxyz - centers[:, None, :]) ** 2, axis=-1)

    out = []
    for radius, nsample in zip(radii, nsamples):
        mask = (d2 < radius * radius) & (cidx < n)
        key = jnp.where(mask, cidx, jnp.float32(n))
        kk = min(nsample, key.shape[-1])
        neg, _ = jax.lax.top_k(-key, kk)
        got = (-neg).astype(jnp.int32)
        if kk < nsample:
            got = jnp.concatenate(
                [got, jnp.full((s, nsample - kk), n, jnp.int32)], axis=-1
            )
        count = jnp.minimum(jnp.sum(mask, axis=-1), nsample).astype(
            jnp.int32)
        first = got[..., :1]
        got = jnp.where(got >= n, jnp.maximum(first, 0), got)
        got = jnp.where(got >= n, 0, got)
        out.append((got, count))
    return out


def group_points(features, idx):
    """Gather (N, C) features by (S, K) indices → (S, K, C)
    (group_points_gpu.cu; gradient via JAX autodiff)."""
    return features[idx]


def three_nn(unknown, known, known_valid):
    """For each of (N, 3) unknown points: 3 nearest (M, 3) known points.

    Returns (dists (N, 3), idx (N, 3)) — interpolate_gpu.cu capability.
    """
    if _use_approx(known.shape[0]):
        # Fused VMEM-resident exact 3-NN (ops.select_kernel) — no (N, M)
        # HBM matrix (59 -> ~5 ms at the (16384, 4096) FP stage-0 shape).
        from lyft3d_tpu.ops.select_kernel import knn_fused

        return knn_fused(unknown, known, known_valid, 3)
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

    # The fused in-box kernel measured on par with this path at the
    # (100, 16384) k=512 shape (k extraction passes dominate) and is
    # EXACT, so it is the TPU path (the approx_min_k first-k here has the
    # same clustered-index recall failure as ball query).
    if _use_fused(points.shape[0]):
        from lyft3d_tpu.ops.select_kernel import roi_inside_select_fused

        idx, count = roi_inside_select_fused(
            points, valid, boxes, num_sampled=num_sampled,
            extra_width=extra_width,
        )
        feats_all = jnp.concatenate([points[:, :3], features], axis=-1)
        pooled = feats_all[idx] * (count > 0)[:, None, None].astype(
            feats_all.dtype)
        return pooled, count, count == 0
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
