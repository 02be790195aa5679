"""Point-cloud voxelization with fixed capacities, on device.

TPU-native replacement for spconv's C++ ``VoxelGeneratorV2``
(``second/second/builder/voxel_builder.py:23-32``): points → (voxels,
coords, num_points) with ``max_voxels`` / ``max_points_per_voxel`` caps.

Formulation: one multi-operand sort carries the point payload with its flat
voxel id, so points land contiguously per voxel; unique voxels are segment
heads in the sorted order. Head positions + voxel ids come from a second
(key, payload) sort — a compaction — instead of scatter-min (measured 2×7 ms
slower as scatters on v5e), and each voxel's points are read with a vmapped
``dynamic_slice`` on the padded sorted array (contiguous 16-row slices;
measured 2.3× faster than a flat row gather, 5× than scatter-build).
Everything static-shape — overflow policy is the reference's (extra voxels
and extra points per voxel dropped).

Returns voxel ids in flat-id (sorted) order, not the reference's
hash-insertion order; the detector is order-invariant so this only changes
tie-breaking.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["VoxelGrid", "voxelize", "block_filter_mask"]

# Packing pitch for the (start, count) compaction payload: start·_PACK +
# count fits int32 for n < 2^31/_PACK ≈ 8.4M points.
_PACK = 256


class VoxelGrid(NamedTuple):
    """Static voxelization spec (from config; voxel_generator proto —
    including the block-filtering knobs of ``all.fhd.config:10-13`` /
    ``second/builder/voxel_builder.py:23-32``)."""

    point_cloud_range: Tuple[float, float, float, float, float, float]
    voxel_size: Tuple[float, float, float]
    # Height-based ground removal: BEV blocks of voxel_size·block_factor·
    # block_size metres estimate the local ground as their lowest point;
    # points closer than height_threshold to it are dropped.
    block_filtering: bool = False
    block_factor: int = 1
    block_size: int = 8
    height_threshold: float = 0.2

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        """(nx, ny, nz)."""
        r = self.point_cloud_range
        return tuple(
            int(round((r[3 + i] - r[i]) / self.voxel_size[i])) for i in range(3)
        )


def block_filter_mask(points, valid, grid: VoxelGrid):
    """Ground-removal mask: True for points ≥ ``height_threshold`` above
    their BEV block's lowest point (the reference's voxel block_filtering,
    ``all.fhd.config:10-13`` "locations with height < height_threshold will
    be removed"). Blocks are (voxel·block_factor·block_size)² columns; the
    per-block min-z is one scatter-min over the coarse block grid.
    """
    r = grid.point_cloud_range
    bw = (
        grid.voxel_size[0] * grid.block_factor * grid.block_size,
        grid.voxel_size[1] * grid.block_factor * grid.block_size,
    )
    nbx = max(int(round((r[3] - r[0]) / bw[0])), 1)
    nby = max(int(round((r[4] - r[1]) / bw[1])), 1)
    bx = jnp.clip(jnp.floor((points[:, 0] - r[0]) / bw[0]).astype(jnp.int32), 0, nbx - 1)
    by = jnp.clip(jnp.floor((points[:, 1] - r[1]) / bw[1]).astype(jnp.int32), 0, nby - 1)
    bid = by * nbx + bx
    z = points[:, 2]
    # Range-crop BEFORE estimating ground (the reference filters after its
    # range mask): an out-of-range point would otherwise be clipped into an
    # edge block and poison that block's min-z.
    in_range = (
        (points[:, 0] >= r[0]) & (points[:, 0] < r[3])
        & (points[:, 1] >= r[1]) & (points[:, 1] < r[4])
    )
    ok = valid & in_range
    # Entirely in sorted space — no scatter, no random gather (a direct
    # scatter-min + zmin[bid] gather measured 17.8 ms at FHD batch 4 on
    # v5e-1; this formulation is ~4 ms with identical semantics):
    #   1. lexicographic (block id, z) sort carrying the original index;
    #   2. each segment's min-z is its HEAD's z — broadcast down the
    #      segment with a segmented-copy associative scan (log-passes of
    #      elementwise selects, no memory indirection);
    #   3. un-sort the per-point verdict by sorting on the carried index.
    n = points.shape[0]
    bid_s, z_s, idx_s = jax.lax.sort(
        (jnp.where(ok, bid, jnp.int32(nbx * nby)),
         jnp.where(ok, z, jnp.inf),
         jnp.arange(n, dtype=jnp.int32)),
        dimension=0, num_keys=2, is_stable=False,
    )
    is_head = jnp.concatenate(
        [jnp.ones((1,), bool), bid_s[1:] != bid_s[:-1]]
    )

    def seg_copy(a, b):
        af, av = a
        bf, bv = b
        return bf | af, jnp.where(bf, bv, av)

    _, zmin_s = jax.lax.associative_scan(seg_copy, (is_head, z_s))
    keep_s = z_s >= zmin_s + grid.height_threshold
    _, keep = jax.lax.sort(
        (idx_s, keep_s.astype(jnp.int32)), dimension=0, num_keys=1,
        is_stable=False,
    )
    return valid & (keep > 0)


def voxelize(
    points,
    valid,
    grid: VoxelGrid,
    max_voxels: int = 20000,
    max_points_per_voxel: int = 5,
    need_point_voxel: bool = False,
):
    """Bin (N, D≥3) padded points into fixed-capacity voxels.

    Returns dict:
        voxels:      (max_voxels, max_points_per_voxel, D) gathered points
        coords:      (max_voxels, 3) integer (ix, iy, iz) voxel coords
        num_points:  (max_voxels,) points per voxel (0 = empty slot)
        voxel_valid: (max_voxels,) bool
        point_voxel: (N,) int32 index of each point's voxel slot (or −1) —
                     for VFE-style encoders that scatter back. Only
                     computed when ``need_point_voxel`` (it costs a third
                     full-N sort — the un-permute — that no shipped
                     encoder needs).
    """
    n, d = points.shape
    nx, ny, nz = grid.grid_size
    r = grid.point_cloud_range
    vs = grid.voxel_size

    if grid.block_filtering:
        valid = block_filter_mask(points, valid, grid)

    ix = jnp.floor((points[:, 0] - r[0]) / vs[0]).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - r[1]) / vs[1]).astype(jnp.int32)
    iz = jnp.floor((points[:, 2] - r[2]) / vs[2]).astype(jnp.int32)
    inb = (
        (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) & (iz >= 0) & (iz < nz) & valid
    )
    # COLUMN-MAJOR (y, x, z) flat ids: voxels of one BEV column are
    # adjacent and columns ascend by bev id — so the column-sparse middle's
    # ``columns_from_voxels`` consumes the active set WITHOUT re-sorting
    # (its key (y·nx+x)·nz+z IS this id). The reference orders (z, y, x)
    # (`:144` create pkl); every consumer here is order-invariant (the
    # detector, target assign, pillar_scatter at nz==1 where the two
    # orders coincide), so this only changes tie-breaking.
    flat = (iy * nx + ix) * nz + iz
    big = jnp.int32(nx * ny * nz)
    flat = jnp.where(inb, flat, big)

    # Payload routing: a TPU sort is O(log²N) data-movement passes over
    # EVERY operand, so carrying the D-wide point payload through it costs
    # D× the (key, index) sort. When the surviving rows (max_voxels ·
    # max_points_per_voxel) are few relative to N — the FHD case: 60k of
    # 262k — it's cheaper to sort (key, index) only and row-gather the
    # payload at the voxel starts afterwards. When most rows survive
    # (dense pillar configs) the contiguous sorted payload wins.
    arange_n = jnp.arange(n, dtype=jnp.int32)
    gather_payload = max_voxels * max_points_per_voxel * 2 <= n
    if gather_payload:
        sorted_ids, orig_idx = jax.lax.sort(
            (flat, arange_n), dimension=0, num_keys=1, is_stable=False
        )
        sorted_pts = None
    else:
        sorted_all = jax.lax.sort(
            (flat, arange_n) + tuple(points[:, j] for j in range(d)),
            dimension=0,
            num_keys=1,
            is_stable=False,
        )
        sorted_ids, orig_idx = sorted_all[0], sorted_all[1]
        sorted_pts = jnp.stack(sorted_all[2:], axis=-1)  # (N, D)

    # Segment heads in sorted order = unique voxels.
    is_head = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    ) & (sorted_ids < big)
    # Voxel RANK per sorted point: running count of heads − 1.
    rank_of_sorted = jnp.cumsum(is_head) - 1  # (N,)
    num_unique = jnp.sum(is_head)
    total_valid = jnp.sum(sorted_ids < big)

    # Overflow policy: when more than ``max_voxels`` voxels are occupied,
    # keep an EVENLY-SPREAD subset over the sorted id order instead of the
    # sorted prefix. A prefix is a spatial band (low-y at this id order),
    # which both biases the detector's field of view and concentrates the
    # survivors into a dense region (measured: the dense band blew the
    # column-stencil windows into their slow fallback). The reference drops
    # excess voxels in hash-insertion order (~point order); even spreading
    # is the deterministic fixed-shape analogue.
    #
    # Membership is decided IN CLOSED FORM per head rank r (identity when
    # num_unique <= max_voxels) — the selected ranks are k·s + min(k, rem),
    # i.e. rem ranks at pitch s+1 then the rest at pitch s — so the kept
    # set needs no post-compaction gather: the r3 formulation selected
    # POSITIONS after the compaction sort through three max_voxels-length
    # dynamic gathers, ~5 ms at the 25k-voxel pillar shape in EVERY regime
    # (the r3→r4 pillars e2e drift; a lax.cond can't skip them because
    # voxelize always runs under vmap, where cond lowers to a
    # both-branches select).
    s = jnp.maximum(num_unique // max_voxels, 1).astype(jnp.int32)
    rem = jnp.maximum(num_unique - s * max_voxels, 0).astype(jnp.int32)
    r = rank_of_sorted
    in_dense = r < rem * (s + 1)  # the rem leading slots at pitch s+1
    kept_r = jnp.where(
        num_unique > max_voxels,
        jnp.where(in_dense, r % (s + 1) == 0,
                  (r - rem) % s == 0) & (r < num_unique),
        r < num_unique,
    )
    slot_r = jnp.where(in_dense, r // (s + 1), (r - rem) // s)
    slot_r = jnp.where(num_unique > max_voxels, slot_r, r)
    kept_r = kept_r & (slot_r < max_voxels)

    # Per-head segment COUNT in sorted space: the next head's position via
    # a reverse cummin over head positions (vector work — no gather). A
    # kept head's segment may be followed by a DROPPED head; its own count
    # never absorbs the neighbor's points because the boundary is the next
    # head of ANY kind.
    head_pos = jnp.where(is_head, arange_n, n)
    next_head = jnp.concatenate([
        jax.lax.cummin(head_pos, reverse=True)[1:], jnp.full((1,), n,
                                                             jnp.int32),
    ])
    seg_end = jnp.minimum(next_head, total_valid)
    cnt = jnp.clip(seg_end - arange_n, 0, max_points_per_voxel)

    # Head positions + ids + counts via ONE compaction sort: kept heads
    # keep their voxel id as the key (slot order == id order — both ascend
    # with rank), dropped/non-head rows sink at ``big``; (start, count)
    # ride as a single packed payload lane, so the sort carries exactly
    # the operands the r2 formulation did and the outputs are STATIC
    # slices.
    assert n * (_PACK + 1) < 2 ** 31 and max_points_per_voxel < _PACK
    pk = arange_n * _PACK + cnt
    key = jnp.where(is_head & kept_r, sorted_ids, big)
    vids_full, pk_full = jax.lax.sort(
        (key, pk), dimension=0, num_keys=1, is_stable=False
    )
    if n < max_voxels:  # fewer points than voxel slots: pad the compaction
        pad = max_voxels - n
        vids_full = jnp.concatenate([vids_full, jnp.full((pad,), big)])
        pk_full = jnp.concatenate([pk_full, jnp.full((pad,), n * _PACK)])
    voxel_ids = vids_full[:max_voxels]
    voxel_valid = voxel_ids < big
    starts = jnp.where(voxel_valid, pk_full[:max_voxels] // _PACK, n)
    num_points = jnp.where(voxel_valid, pk_full[:max_voxels] % _PACK, 0)

    if gather_payload:
        # Windows of the sorted ORIGINAL INDICES (1-int rows — cheap), then
        # one (max_voxels · mppv)-row gather of the raw points.
        idx_padded = jnp.concatenate(
            [orig_idx, jnp.full((max_points_per_voxel,), n, jnp.int32)]
        )
        idx_win = jax.vmap(
            lambda s0: jax.lax.dynamic_slice(
                idx_padded, (s0,), (max_points_per_voxel,)
            )
        )(starts)
        pts_pad = jnp.concatenate(
            [points, jnp.zeros((1, d), points.dtype)], axis=0
        )
        voxels = pts_pad[idx_win]
    else:
        # Contiguous per-voxel slices from the padded sorted payload (vmapped
        # dynamic_slice — no row gather; padding keeps every start in bounds).
        padded = jnp.concatenate(
            [sorted_pts, jnp.zeros((max_points_per_voxel, d), points.dtype)],
            axis=0,
        )
        voxels = jax.vmap(
            lambda s0: jax.lax.dynamic_slice(
                padded, (s0, 0), (max_points_per_voxel, d)
            )
        )(starts)
    seg = jnp.arange(max_points_per_voxel, dtype=jnp.int32)
    voxels = voxels * (
        (seg[None, :] < num_points[:, None]) & voxel_valid[:, None]
    )[..., None].astype(points.dtype)

    iz_v = voxel_ids % nz
    ix_v = (voxel_ids // nz) % nx
    iy_v = voxel_ids // (nz * nx)
    coords = jnp.stack(
        [jnp.where(voxel_valid, c, 0) for c in (ix_v, iy_v, iz_v)], axis=-1
    )

    out = {
        "voxels": voxels,
        "coords": coords,
        "num_points": num_points,
        "voxel_valid": voxel_valid,
    }
    if need_point_voxel:
        # Map each original point to its voxel slot (−1 if its voxel was
        # dropped by the even-spread overflow policy): un-sort the
        # per-point slot by sorting on the carried original index.
        slot_sorted = jnp.where(
            (sorted_ids < big) & kept_r, slot_r, -1
        ).astype(jnp.int32)
        _, point_voxel = jax.lax.sort(
            (orig_idx, slot_sorted), dimension=0, num_keys=1, is_stable=False
        )
        out["point_voxel"] = point_voxel
    return out
