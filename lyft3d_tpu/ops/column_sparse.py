"""Sparse 3D convolution over BEV columns with a dense z axis.

The TPU-optimal formulation of spconv's SubMConv3d/SparseConv3d stacks
(``second/second/pytorch/models/middle.py`` SpMiddleFHD:111-212;
SURVEY.md §2.3 N10b) — a redesign of ``ops.sparse_conv``'s per-voxel
gather-einsum driven by v5e-1 traces:

- the (K=27, V, C) per-voxel neighbor row gathers dominate the gather
  formulation (46 ms per stage-0 subm layer at batch 4 — rows of 16
  lanes gather on a slow sub-tile path);
- 27-offset id resolution costs a (27, 2V) merge-sort per stage.

Here active voxels are grouped into BEV **columns** (distinct (x, y)),
each storing all ``nz`` z-cells densely plus an activity mask. Lidar
z-extents are tiny (40 → 20 → 10 → 5 across SpMiddleFHD's strides), so
the dense-z waste is small, and in exchange:

- dz kernel offsets become in-register z-shifts (free);
- only **9** BEV offsets need id resolution (ids over the nx·ny plane);
- neighbor gathers move whole columns — nz·C contiguous elements
  (≥1280 B at stage 0), vector-load friendly instead of element-ish;
- the 27-tap contraction runs as 9 matmuls with a 3C-wide contraction
  (z shifts concatenated), real MXU work.

Semantics match the gather formulation exactly at active sites (same
kernel-offset ordering as ``ops.sparse_conv.kernel_offsets``; capacity
caps apply to columns instead of voxels). Equality is tested against the
per-voxel formulation in tests/test_column_sparse.py.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lyft3d_tpu.ops.dense_fill import fill_rows_by_id
from lyft3d_tpu.ops.sparse_conv import ActiveSet, resolve_ids

__all__ = [
    "ColumnSet",
    "columns_from_voxels",
    "column_neighbors",
    "subm_conv_columns",
    "downsample_columns",
    "strided_conv_columns",
    "columns_to_dense_bev",
    "subm_conv_columns_batched",
    "strided_conv_columns_batched",
    "subm_qids_one",
    "stencil_conv_batched",
    "PAD_ID",
]


class ColumnSet(struct.PyTreeNode):
    """Fixed-capacity set of active BEV columns with dense-z voxel masks."""

    col_ids: jnp.ndarray  # (Vc,) int32 BEV flat ids (y·nx + x), ascending,
    #                        invalid entries carry nx·ny at the tail
    valid: jnp.ndarray  # (Vc,) bool
    mask: jnp.ndarray  # (Vc, nz) bool — active voxels within each column
    bev_shape: Tuple[int, int] = struct.field(pytree_node=False)  # (nx, ny)
    nz: int = struct.field(pytree_node=False)

    @property
    def coords(self):
        """(Vc, 2) int32 (x, y); invalid rows undefined (mask by valid)."""
        nx, _ = self.bev_shape
        return jnp.stack([self.col_ids % nx, self.col_ids // nx], axis=-1)


def _bev_offsets2d():
    """(9, 2) int32 (dx, dy) in ``kernel_offsets(3)`` outer order: the 3D
    offset (dx, dy, dz) lives at k = ((dx+1)·3 + (dy+1))·3 + (dz+1), so a
    (27, C, C') weight reshaped (9, 3, C, C') pairs row j with this
    function's j-th offset and the 3 dz taps."""
    r = (-1, 0, 1)
    return jnp.asarray(list(itertools.product(r, r)), jnp.int32)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def columns_from_voxels(features, active: ActiveSet, assume_sorted: bool = False):
    """(V, C) voxel features + 3D active set → (ColumnSet, (Vc, nz, C)).

    Column capacity = V (every voxel its own column in the worst case).
    ``assume_sorted``: the active set is already in (bev id, z) order with
    invalid entries at the tail — true for ``ops.voxelize`` output (its
    flat ids ARE (y·nx+x)·nz+z) — skipping the sort.

    Each column's voxels are CONTIGUOUS in sorted order, so column rows
    come from per-column ``dynamic_slice`` windows of ≤nz rows placed at
    their z cells by a local (nz, nz) one-hot contraction — contiguous
    reads + small matmuls instead of a (V·nz)-row canvas scatter (the
    scatter formulation measured 20.6 ms at FHD batch 4 on v5e-1; windows
    ~4x faster — the same lesson as ops/voxelize's slice-vs-scatter note).
    """
    nx, ny, nz = active.spatial_shape
    v, c = features.shape
    big2 = nx * ny
    assert big2 * nz < 2 ** 30, (nx, ny, nz)
    bev = active.coords[:, 1] * nx + active.coords[:, 0]
    key = jnp.where(active.valid, bev * nz + active.coords[:, 2],
                    jnp.int32(big2 * nz))
    if assume_sorted:
        skey, f_s = key, features
    else:
        skey, perm = jax.lax.sort(
            (key, jnp.arange(v, dtype=jnp.int32)), num_keys=1
        )
        f_s = features[perm]
    valid_s = skey < big2 * nz
    bev_s = skey // nz
    z_s = skey % nz
    head = (
        jnp.concatenate([jnp.ones((1,), bool), bev_s[1:] != bev_s[:-1]])
        & valid_s
    )
    crank = jnp.cumsum(head.astype(jnp.int32)) - 1  # column index per row
    arange_v = jnp.arange(v, dtype=jnp.int32)
    # Non-head rows carry the OOB index v (dropped), interspersed between
    # the ascending head cranks — so indices are NOT globally sorted.
    target = jnp.where(head, crank, v)
    col_ids = jnp.full((v,), big2, jnp.int32).at[target].set(
        bev_s, mode="drop", unique_indices=True
    )
    col_valid = col_ids < big2
    # Placement by INVERSE PERMUTATION (same fix as units_from_voxels):
    # one scalar scatter builds inv[crank·nz + z] = sorted row, one
    # full-row gather fetches the features. The per-column
    # vmap(dynamic_slice) window formulation hit XLA:TPU's serial gather
    # path on data-dependent starts (~1 s at FHD batch-4 for the unit
    # variant, scripts/profile_ufv_parts.py).
    dest = jnp.where(valid_s, crank * nz + z_s, jnp.int32(v * nz))
    inv = jnp.full((v * nz,), v, jnp.int32).at[dest].set(
        arange_v, mode="drop", unique_indices=True
    )
    f_pad = jnp.concatenate([f_s, jnp.zeros((1, c), f_s.dtype)])
    colf = f_pad[inv].reshape(v, nz, c)
    mask = (inv < v).reshape(v, nz)
    cols = ColumnSet(col_ids=col_ids, valid=col_valid, mask=mask,
                     bev_shape=(nx, ny), nz=nz)
    return cols, colf


def _cfv_fwd(features, active: ActiveSet, assume_sorted: bool):
    out = columns_from_voxels.fun(features, active, assume_sorted)
    nx, ny, nz = active.spatial_shape
    v = features.shape[0]
    big2 = nx * ny
    bev = active.coords[:, 1] * nx + active.coords[:, 0]
    key = jnp.where(active.valid, bev * nz + active.coords[:, 2],
                    jnp.int32(big2 * nz))
    if assume_sorted:
        perm = None
        skey = key
    else:
        skey, perm = jax.lax.sort(
            (key, jnp.arange(v, dtype=jnp.int32)), num_keys=1
        )
    valid_s = skey < big2 * nz
    bev_s = skey // nz
    head = (
        jnp.concatenate([jnp.ones((1,), bool), bev_s[1:] != bev_s[:-1]])
        & valid_s
    )
    crank = jnp.cumsum(head.astype(jnp.int32)) - 1
    # 0-size dtype carrier: a raw np.dtype is not a valid VJP residual.
    dt = jnp.zeros((0,), features.dtype)
    return out, (crank, skey % nz, valid_s, perm, dt)


def _cfv_bwd(assume_sorted: bool, res, ct):
    """Each source voxel lands in exactly one (column, z) cell, so d_features
    is a pure GATHER of d_colf — the vmapped-dynamic_slice transpose XLA
    would otherwise emit is an overlapping-window scatter-add that
    serializes per column."""
    crank, z_s, valid_s, perm, dt = res
    _, d_colf = ct  # cols carries int/bool leaves → symbolic-zero cotangent
    g = d_colf[jnp.clip(crank, 0, d_colf.shape[0] - 1), z_s]
    g = (g * valid_s[:, None].astype(g.dtype)).astype(dt.dtype)
    if perm is not None:
        g = jnp.zeros_like(g).at[perm].set(g, unique_indices=True)
    return g, None


columns_from_voxels.defvjp(_cfv_fwd, _cfv_bwd)


def column_neighbors(cols: ColumnSet, method: Optional[str] = None):
    """(9, Vc) column ranks for the 3×3 BEV stencil (−1 absent).

    ``col_ids`` is already ascending, so ranks index the column arrays
    directly (identity permutation — no build_hash needed)."""
    nx, ny = cols.bev_shape
    big2 = jnp.int32(nx * ny)
    offs = _bev_offsets2d()
    q = cols.coords[None, :, :] + offs[:, None, :]  # (9, Vc, 2)
    inb = (
        cols.valid[None, :]
        & (q[..., 0] >= 0) & (q[..., 0] < nx)
        & (q[..., 1] >= 0) & (q[..., 1] < ny)
    )
    qids = jnp.where(inb, q[..., 1] * nx + q[..., 0], big2)
    return resolve_ids(cols.col_ids, big2, qids, method, volume=nx * ny)


def _gather_rows(padded, rank):
    """(Vc_in, L) flat z-padded columns + (Vq,) ranks → (Vq, L), zeros
    where rank < 0. Wide-lane (L = (nz+2)·C ≥ 128) row gathers — the fast
    gather path, unlike (nz, C)-shaped windows whose 16-lane minor dim
    lands on a sub-tile path (measured 555 ms/layer at FHD stage 0)."""
    ok = rank >= 0
    out = padded[jnp.clip(rank, 0, padded.shape[0] - 1)]
    return out * ok[:, None].astype(padded.dtype)


def _banded_weight(wj, nz_out: int, nz_pad: int, stride: int):
    """(3, C, Cout) z-taps → ((nz_pad)·C, nz_out·Cout) block-banded matrix
    folding the z-shift structure into one MXU contraction: output z-cell
    ``oz`` reads padded input row ``stride·oz + dz``. The K-dim redundancy
    (nz_pad/3×) buys a well-shaped (V, nz_pad·C)@(nz_pad·C, nz·Cout)
    matmul instead of nz_pad-row slice/concat traffic + K=3C einsums."""
    _, cin, cout = wj.shape
    iz = jnp.arange(nz_pad)[None, :, None]
    oz = jnp.arange(nz_out)[None, None, :]
    dz = jnp.arange(3)[:, None, None]
    sel = (iz == stride * oz + dz).astype(wj.dtype)  # (3, nz_pad, nz_out)
    wb = jnp.einsum("dio,dce->icoe", sel, wj)
    return wb.reshape(nz_pad * cin, nz_out * cout)


def subm_conv_columns(colf, cols: ColumnSet, neighbors, w):
    """Submanifold 3³ conv over columns.

    Args:
        colf: (Vc, nz, C) column features.
        cols: the active set (mask zeroes inactive contributors).
        neighbors: (9, Vc) from ``column_neighbors``.
        w: (27, C, Cout) in ``kernel_offsets(3)`` order.

    Returns (Vc, nz, Cout) f32 — mask/normalize at the caller (outputs at
    inactive sites are computed and must be masked, matching the gather
    formulation's valid-row masking).
    """
    vc, nz, cin = colf.shape
    cout = w.shape[-1]
    w93 = w.reshape(9, 3, cin, cout)  # [j, dz] per kernel_offsets order
    fm = colf * cols.mask[..., None].astype(colf.dtype)
    padded = jnp.pad(fm, ((0, 0), (1, 1), (0, 0))).reshape(
        vc, (nz + 2) * cin
    )
    out = jnp.zeros((vc, nz * cout), jnp.float32)
    for j in range(9):
        nf = _gather_rows(padded, neighbors[j])
        wb = _banded_weight(w93[j], nz, nz + 2, 1).astype(nf.dtype)
        out = out + jnp.dot(nf, wb, preferred_element_type=jnp.float32)
    return out.reshape(vc, nz, cout)


def downsample_columns(cols: ColumnSet, max_out: int):
    """Output ColumnSet of a k=3, s=2, p=1 strided conv (2D analogue of
    ``ops.sparse_conv.downsample_coords``): every output column receiving
    ≥1 active input column, capped at ``max_out``. The z mask is filled by
    ``strided_conv_columns``."""
    nx, ny = cols.bev_shape
    onx = (nx + 2 - 3) // 2 + 1
    ony = (ny + 2 - 3) // 2 + 1
    nzo = (cols.nz + 2 - 3) // 2 + 1
    obig = jnp.int32(onx * ony)
    num = cols.coords + 1  # + padding
    o_hi = num // 2
    o_lo = -((-(num - 2)) // 2)

    combos = jnp.asarray(list(itertools.product(range(2), range(2))), jnp.int32)

    def per_combo(j):
        o = o_lo + j[None, :]
        ok = (
            cols.valid
            & jnp.all(o <= o_hi, axis=1)
            & (o[:, 0] >= 0) & (o[:, 0] < onx)
            & (o[:, 1] >= 0) & (o[:, 1] < ony)
        )
        return jnp.where(ok, o[:, 1] * onx + o[:, 0], obig)

    cand = jax.vmap(per_combo)(combos).reshape(-1)
    cand = jnp.sort(cand)
    is_head = jnp.concatenate(
        [jnp.ones((1,), bool), cand[1:] != cand[:-1]]
    ) & (cand < obig)
    heads_sorted = jax.lax.sort(jnp.where(is_head, cand, obig))
    # Cap overflow: evenly-spread survivors (see _even_select), not the
    # lowest-id prefix.
    out_ids = heads_sorted[_even_select(heads_sorted, jnp.sum(is_head),
                                        max_out)]
    out_valid = out_ids < obig
    return ColumnSet(
        col_ids=out_ids, valid=out_valid,
        mask=jnp.zeros((max_out, nzo), bool),
        bev_shape=(onx, ony), nz=nzo,
    )


def strided_conv_columns(colf, in_cols: ColumnSet, out_cols: ColumnSet, w,
                         method: Optional[str] = None):
    """k=3, s=2, p=1 strided sparse conv over columns.

    Returns ((Vco, nzo, Cout) f32 features, (Vco, nzo) bool out mask) —
    out mask = any active input voxel in the 3³ window (spconv's output
    active-site rule). Mask/normalize features at the caller.
    """
    vc, nz, cin = colf.shape
    vco = out_cols.col_ids.shape[0]
    nzo = out_cols.nz
    cout = w.shape[-1]
    nx, ny = in_cols.bev_shape
    big2 = jnp.int32(nx * ny)
    w93 = w.reshape(9, 3, cin, cout)

    offs = _bev_offsets2d()
    q = out_cols.coords[None, :, :] * 2 + offs[:, None, :]  # 2·o + kk − 1
    inb = (
        out_cols.valid[None, :]
        & (q[..., 0] >= 0) & (q[..., 0] < nx)
        & (q[..., 1] >= 0) & (q[..., 1] < ny)
    )
    qids = jnp.where(inb, q[..., 1] * nx + q[..., 0], big2)
    rank = resolve_ids(in_cols.col_ids, big2, qids, method, volume=nx * ny)

    fm = colf * in_cols.mask[..., None].astype(colf.dtype)
    padded = jnp.pad(fm, ((0, 0), (1, 1), (0, 0))).reshape(
        vc, (nz + 2) * cin
    )
    mask_p = jnp.pad(
        in_cols.mask.astype(jnp.float32), ((0, 0), (1, 1))
    )
    # Band for the z window of a stride-2 conv: output oz reads padded
    # input rows 2·oz + {0,1,2}; summed over dz it also counts active
    # inputs per window for the output mask.
    iz = jnp.arange(nz + 2)[None, :, None]
    oz = jnp.arange(nzo)[None, None, :]
    dz = jnp.arange(3)[:, None, None]
    msel = ((iz == 2 * oz + dz).astype(jnp.float32)).sum(0)  # (nz+2, nzo)
    out = jnp.zeros((vco, nzo * cout), jnp.float32)
    m_out = jnp.zeros((vco, nzo), jnp.float32)
    for j in range(9):
        nf = _gather_rows(padded, rank[j])
        nm = _gather_rows(mask_p, rank[j])
        wb = _banded_weight(w93[j], nzo, nz + 2, 2).astype(nf.dtype)
        out = out + jnp.dot(nf, wb, preferred_element_type=jnp.float32)
        m_out = m_out + jnp.dot(nm, msel,
                                preferred_element_type=jnp.float32)
    return (
        out.reshape(vco, nzo, cout),
        (m_out > 0.5) & out_cols.valid[:, None],
    )


def columns_to_dense_bev(colf, cols: ColumnSet):
    """(Vc, nz, C) columns → (ny, nx, nz·C) dense BEV, channel layout
    identical to ``models.second.middle.sparse_to_dense_bev`` (z-major
    then C)."""
    nx, ny = cols.bev_shape
    vc, nz, c = colf.shape
    rows = (colf * cols.mask[..., None].astype(colf.dtype)).reshape(
        vc, nz * c
    )
    dense = fill_rows_by_id(rows, cols.col_ids, cols.valid, ny * nx,
                            assume_sorted=True)
    return dense.reshape(ny, nx, nz * c)


# ---------------------------------------------------------------------------
# Fused stencil kernel: the batched TPU fast path.
#
# v5e-1 measurements at FHD stage 0 (V=60k, nz=40, C=16→16, batch 4) drove
# three changes over the per-offset XLA formulation above:
#   - 9 XLA row gathers cost ~30 ms/layer (a 1-row fetch still reads whole
#     (16, 128) tiles — ~10× HBM amplification);
#   - the full-band (672,)→(640,) matmuls run 14× redundant FLOPs;
#   - 9 separate f32 accumulations round-trip the (V, 640) output ~11 GB.
# Here (per grid tile of T query columns): the neighbor positions of one
# dy-band are monotone over the sorted column ids, so one contiguous (W, P)
# window per band covers all its hits; windows are pre-sliced (sequential
# reads) and streamed to VMEM, each offset's rows come out of the window by
# matching COLUMN IDS on the MXU (one-hot = window-id == query-id + offset
# shift), and the z-chunked band weights (K≈256 per chunk) contract
# in-kernel with a single f32 accumulator.
#
# ID MATCHING (round 3): each BEV stencil offset (dx, dy) is a CONSTANT
# flat-id shift dy·nx + dx, so neighbor queries are pure arithmetic on the
# sorted column ids and the kernel matches ids directly against the
# window's id slice. This removed the per-layer `resolve_ids` passes
# entirely — the merge-sort rank resolution measured 17-25 ms per call at
# FHD stage-0 scale (9×60k queries, batch 4), the single biggest
# non-matmul cost in the round-2 profile. What remains outside the kernel
# is one tiny searchsorted per tile-band for window starts (~700 queries)
# and contiguous dynamic-slice reads of the id windows.
#
# Escapes (a band's hit span exceeding its window — possible only under
# adversarial column layouts) are detected outside and the whole batch
# falls back to the exact XLA reference via one lax.cond.
# ---------------------------------------------------------------------------

_TARGET_K = 256

# Padding value for absent source ids: larger than any real BEV flat id
# (nx·ny ≤ 2^22 at FHD) yet safe to double inside lookup_batch's id·2+tag
# packing in int32.
PAD_ID = 2 ** 28


class _ChunkPlan(NamedTuple):
    z: int          # output z-cells per chunk
    kzrows: int     # input (padded-z) rows per chunk window
    kz: int         # kzrows * cin
    kzp: int        # kz rounded up to a 128-lane multiple
    nc: int         # number of chunks
    need_rows: int  # padded-z input rows consumed by all chunks


def _chunk_plan(cin: int, nz_out: int, stride: int) -> _ChunkPlan:
    z = max(1, min((_TARGET_K // cin - 3) // stride + 1, nz_out))
    kzrows = stride * (z - 1) + 3
    kz = kzrows * cin
    kzp = -(-kz // 128) * 128
    nc = -(-nz_out // z)
    need = stride * z * (nc - 1) + kzrows
    return _ChunkPlan(z, kzrows, kz, kzp, nc, need)


def _chunk_source(fm, plan: _ChunkPlan, stride: int):
    """(V, nz, C) masked features → (V, nc·kzp) z-padded chunked rows.

    Row layout per chunk c: padded-z rows [stride·z·c, stride·z·c+kzrows)
    flattened C-minor, zero-padded to kzp lanes."""
    v, nz, cin = fm.shape
    p = jnp.pad(fm, ((0, 0), (1, plan.need_rows - nz - 1), (0, 0)))
    flat = p.reshape(v, plan.need_rows * cin)
    chunks = []
    for c in range(plan.nc):
        s = stride * plan.z * c * cin
        ck = flat[:, s: s + plan.kz]
        chunks.append(jnp.pad(ck, ((0, 0), (0, plan.kzp - plan.kz))))
    return jnp.concatenate(chunks, axis=-1)


def _chunk_weights(w93, plan: _ChunkPlan, stride: int):
    """(9, 3, C, Cout) z-taps → (9, kzp, z·Cout) shared per-chunk bands."""
    _, _, cin, cout = w93.shape
    wb = jax.vmap(
        lambda wj: _banded_weight(wj, plan.z, plan.kzrows, stride)
    )(w93)  # (9, kz, z*cout)
    return jnp.pad(wb, ((0, 0), (0, plan.kzp - plan.kz), (0, 0)))


def subm_qids_one(cols: ColumnSet):
    """(9, Vc) neighbor query IDS for the submanifold stencil — pure
    arithmetic (each offset is the constant id shift dy·nx + dx); −1 where
    absent/out of bounds. No rank resolution."""
    nx, ny = cols.bev_shape
    offs = _bev_offsets2d()
    q = cols.coords[None, :, :] + offs[:, None, :]
    inb = (
        cols.valid[None, :]
        & (q[..., 0] >= 0) & (q[..., 0] < nx)
        & (q[..., 1] >= 0) & (q[..., 1] < ny)
    )
    return jnp.where(inb, q[..., 1] * nx + q[..., 0], -1)


def _lookup_ranks(src_ids, qids):
    """(9, Q) query ids (−1 absent) → sorted-order ranks via the batched
    merge (ops.sparse_conv.lookup_batch). Only used by the XLA reference
    path / cond fallback and the weight-gradient gather — the fused kernel
    matches ids directly."""
    from lyft3d_tpu.ops.sparse_conv import lookup_batch

    big = jnp.int32(PAD_ID)
    ok = qids >= 0
    return lookup_batch(src_ids, big, jnp.where(ok, qids, big), ok)


def _stencil_ref_ids(src, qids, src_ids, wc, nc: int):
    """Exact XLA reference (and cond fallback / VJP primal) of the kernel.

    src: (Vs, nc·kzp) chunked rows; qids: (9, Vq) neighbor ids; src_ids:
    (Vs,) ascending ids; wc: (9, kzp, N). Returns (Vq, nc·N) f32."""
    vs = src.shape[0]
    kzp = wc.shape[1]
    ranks = _lookup_ranks(src_ids, qids)
    ok = ranks >= 0
    g = src[jnp.clip(ranks, 0, vs - 1)] * ok[..., None].astype(src.dtype)
    g = g.reshape(9, qids.shape[1], nc, kzp)
    out = jnp.einsum("jvck,jkn->vcn", g, wc.astype(src.dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(qids.shape[1], -1)


def _stencil_kernel(st_ref, qid_ref, wid_ref, src_ref, w_ref, out_ref, win,
                    sems, *, nc: int, kzp: int, w_win: int):
    """One query tile: DMA the 3 band windows straight from HBM
    (double-buffered across grid steps), then 9 × (id-match one-hot
    row-select on the MXU + z-chunked band contraction) into a single f32
    accumulator. The one-hot never exists in HBM and neither do the
    windows — HBM sees sequential window reads and one output write."""
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    tt = out_ref.shape[0]

    def start_dmas(gi, slot):
        for b in range(3):
            # st carries start//8 — the ×8 proves the 8-row DMA alignment
            # Mosaic requires for dynamic sublane starts.
            pltpu.make_async_copy(
                src_ref.at[pl.ds(st_ref[gi, b] * 8, w_win)],
                win.at[slot, b],
                sems.at[slot, b],
            ).start()

    @pl.when(g == 0)
    def _():
        start_dmas(0, 0)

    @pl.when(g + 1 < ng)
    def _():
        start_dmas(g + 1, (g + 1) % 2)

    slot = g % 2
    for b in range(3):
        pltpu.make_async_copy(
            src_ref.at[pl.ds(st_ref[g, b] * 8, w_win)],
            win.at[slot, b],
            sems.at[slot, b],
        ).wait()

    qid = qid_ref[0]  # (9, T); T on lanes — (T, 9) would lane-pad 9 → 128
    wids = wid_ref[0]  # (3, W) window source ids
    n = w_ref.shape[-1]
    accs = [jnp.zeros((tt, n), jnp.float32) for _ in range(nc)]
    for j in range(9):
        # One-hot by ID EQUALITY: window ids are unique (sorted source),
        # absent queries carry −1 and pad rows carry PAD_ID — no match.
        oh = (wids[j % 3][None, :] == qid[j][:, None]).astype(win.dtype)
        gth = jnp.dot(oh, win[slot, j % 3],
                      preferred_element_type=jnp.float32).astype(win.dtype)
        wj = w_ref[j]
        for c in range(nc):
            accs[c] = accs[c] + jnp.dot(
                gth[:, c * kzp: (c + 1) * kzp], wj,
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = jnp.concatenate(accs, axis=-1)


def _window_prep_ids(src_ids, qids, t_tile: int, w_win: int):
    """Per-sample window-start prep from IDS (no ranks).

    src_ids: (Vs,) ascending ids (invalid tail ≥ PAD_ID or any value above
    every valid query id); qids: (9, Vq) (−1 absent). Band b = j % 3 (the
    dy index) shares one window; its start is the position of the band's
    least query id — found with a TINY searchsorted (3·NT queries), the
    only position lookup left in the fused path.

    Returns (qt (NT, 9, T), starts (NT, 3), ok scalar bool).
    """
    vq = qids.shape[1]
    vs = src_ids.shape[0]
    nt = -(-vq // t_tile)
    vqp = nt * t_tile
    qk = jnp.pad(qids, ((0, 0), (0, vqp - vq)), constant_values=-1)
    qk = qk.reshape(9, nt, t_tile)
    big = jnp.int32(2 ** 30)
    starts = []
    oks = []
    for b in range(3):
        qb = qk[b::3]  # (3, nt, T)
        lo = jnp.min(jnp.where(qb >= 0, qb, big), axis=(0, 2))  # (nt,)
        hi = jnp.max(qb, axis=(0, 2))  # (nt,) — −1 if band empty
        s = jnp.searchsorted(src_ids, lo).astype(jnp.int32)
        e = jnp.searchsorted(src_ids, hi, side="right").astype(jnp.int32)
        # Mosaic requires dynamic sublane-dim DMA starts divisible by the
        # (8, 128) tiling; round down (w_win carries the +7 slack).
        s = (jnp.clip(s, 0, vs) // 8) * 8
        starts.append(s)
        oks.append(jnp.where(hi >= 0, e - s <= w_win, True))
    ok = jnp.all(jnp.stack(oks))
    return qk.transpose(1, 0, 2), jnp.stack(starts).T, ok


def _stencil_pallas_flat(qt, starts, win_ids, src_flat, wc, nc: int,
                         w_win: int, interpret: bool):
    """Flattened-batch kernel launch: grid = B·NT tiles; per-batch source
    offsets are already folded into ``starts`` (batch b's rows live at
    [b·Vsp, (b+1)·Vsp) of ``src_flat``)."""
    g, _, tt = qt.shape
    pp = src_flat.shape[-1]
    n = wc.shape[-1]
    kzp = wc.shape[1]
    return pl.pallas_call(
        partial(_stencil_kernel, nc=nc, kzp=kzp, w_win=w_win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((1, 9, tt), lambda t, st: (t, 0, 0)),
                pl.BlockSpec((1, 3, w_win), lambda t, st: (t, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((9, kzp, n), lambda t, st: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((tt, nc * n), lambda t, st: (t, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 3, w_win, pp), src_flat.dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((g * tt, nc * n), jnp.float32),
        interpret=interpret,
    )(starts, qt, win_ids, src_flat, wc)


def stencil_coverage_ok(src_ids, qids, vs: int, t_tile: int, w_win: int):
    """Would the fused kernel's windows cover every hit for this geometry?

    Replicates ``_stencil_run``'s effective-tile arithmetic and returns the
    per-batch coverage flag — a False means ``stencil_conv_batched`` with
    these tiles silently runs the exact-but-slow XLA gather reference for
    the WHOLE batch (the lax.cond fallback). Pure id arithmetic (features
    never matter), so it is cheap to call for diagnostics; see
    scripts/debug_sparse_e2e.py."""
    vq = qids.shape[-1]
    t_eff = min(t_tile, -(-vq // 8) * 8)
    w_eff = -(-min(w_win, vs + t_tile) // 8) * 8 + 8
    _, _, ok = jax.vmap(
        lambda i, q: _window_prep_ids(i, q, t_eff, w_eff)
    )(src_ids, qids)
    return ok


def _stencil_run(src, qids, src_ids, wc, nc: int, t_tile: int, w_win: int,
                 method: str):
    """The stencil conv proper (no custom VJP) — shared by the forward
    and, with reverse queries + transposed band weights, the backward."""
    b, _, vq = qids.shape
    vs = src.shape[1]
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "ref"
    wc_c = wc.astype(src.dtype)
    if method == "ref":
        return jax.vmap(
            lambda s, q, i: _stencil_ref_ids(s, q, i, wc_c, nc)
        )(src, qids, src_ids)
    interpret = method == "pallas_interpret"
    t_eff = min(t_tile, -(-vq // 8) * 8)
    # +8: window starts are rounded down to 8-row alignment in
    # _window_prep_ids (Mosaic dynamic-DMA constraint).
    w_eff = -(-min(w_win, vs + t_tile) // 8) * 8 + 8
    qt, starts, ok = jax.vmap(
        lambda i, q: _window_prep_ids(i, q, t_eff, w_eff)
    )(src_ids, qids)
    nt = qt.shape[1]
    # Multiple of 8 so batch-offset starts stay 8-aligned when flattened.
    vsp = -(-(vs + w_eff) // 8) * 8
    src_flat = jnp.pad(src, ((0, 0), (0, vsp - vs), (0, 0))).reshape(
        b * vsp, -1
    )
    # Window id slices (contiguous dynamic_slice reads — the fast path, no
    # row gather); pad rows carry PAD_ID which matches no query.
    ids_padded = jnp.pad(src_ids, ((0, 0), (0, vsp + w_eff - vs)),
                         constant_values=PAD_ID)
    win_ids = jax.vmap(
        lambda ids, st: jax.vmap(
            lambda s3: jax.vmap(
                lambda s0: jax.lax.dynamic_slice(ids, (s0 * 8,), (w_eff,))
            )(s3)
        )(st // 8)
    )(ids_padded, starts)  # (B, NT, 3, W)
    # Starts and vsp are multiples of 8; the kernel receives start//8 and
    # rescales in-kernel so Mosaic can prove DMA alignment.
    starts_flat = (
        (starts + (jnp.arange(b, dtype=jnp.int32) * vsp)[:, None, None]) // 8
    ).reshape(b * nt, 3)
    qt_flat = qt.reshape(b * nt, 9, t_eff)
    wid_flat = win_ids.reshape(b * nt, 3, w_eff)

    def pallas_branch(args):
        qf, sf, wf = args
        out = _stencil_pallas_flat(qf, sf, wf, src_flat, wc_c, nc, w_eff,
                                   interpret)
        return out.reshape(b, nt * t_eff, -1)[:, :vq]

    out = jax.lax.cond(
        jnp.all(ok),
        pallas_branch,
        lambda _: jax.vmap(
            lambda s, q, i: _stencil_ref_ids(s, q, i, wc_c, nc)
        )(src, qids, src_ids),
        (qt_flat, starts_flat, wid_flat),
    )
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def stencil_conv_batched(src, qids, src_ids, wc, nc: int, t_tile: int = 256,
                         w_win: int = 384, method: str = "auto",
                         rev_qids=None, rev_src_ids=None):
    """Batched 9-offset stencil conv over chunked column rows, id-matched.

    src: (B, Vs, nc·kzp) bf16 chunked source rows (``_chunk_source``);
    qids: (B, 9, Vq) int32 neighbor QUERY IDS per offset (−1 absent) —
        pure arithmetic on the sorted column ids, no rank resolution;
    src_ids: (B, Vs) int32 ascending source column ids (invalid tail
        strictly above every valid query id);
    wc: (9, kzp, N) chunk band weights (``_chunk_weights``);
    rev_qids/rev_src_ids: optional reverse stencil (for each source row v
        and offset j, the id of the query that reads v — again arithmetic).
        When given, the backward's d_src runs as a second FUSED stencil
        (transposed band weights) instead of differentiating the XLA
        gather reference — the gather's scatter-add transpose serializes
        per row on TPU and dominated the sparse-middle train step.
    Returns (B, Vq, nc·N) f32.

    method: "auto" (pallas+cond on TPU, reference elsewhere), "pallas",
    "pallas_interpret", or "ref".
    """
    return _stencil_run(src, qids, src_ids, wc, nc, t_tile, w_win, method)


def _stencil_fwd(src, qids, src_ids, wc, nc, t_tile, w_win, method,
                 rev_qids=None, rev_src_ids=None):
    out = _stencil_run(src, qids, src_ids, wc, nc, t_tile, w_win, method)
    return out, (src, qids, src_ids, wc, rev_qids, rev_src_ids)


def _stencil_bwd(nc, t_tile, w_win, method, res, g):
    src, qids, src_ids, wc, rev_qids, rev_src_ids = res
    if rev_qids is None:
        # Exact legacy path: differentiate the XLA reference formulation.
        _, vjp = jax.vjp(
            lambda s, w: jax.vmap(
                lambda ss, qq, ii: _stencil_ref_ids(
                    ss, qq, ii, w.astype(s.dtype), nc
                )
            )(s, qids, src_ids),
            src, wc,
        )
        ds, dwc = vjp(g)
        return ds, None, None, dwc, None, None

    b, _, vq = qids.shape
    kzp, n = wc.shape[1], wc.shape[2]

    # d_src: the transposed conv IS a 9-offset stencil over the cotangent
    # rows — d_src[v] = Σ_j g[q: id(q) = rev_qids[j, v]] @ wc[j]ᵀ per
    # chunk — so it runs through the same fused kernel with chunk width N
    # (lane-padded) and output width kzp. The cotangent rows' ids are the
    # forward QUERY ids (rev_src_ids).
    np_ = -(-n // 128) * 128
    gsrc = g.astype(src.dtype).reshape(b, vq, nc, n)
    gp = jnp.pad(gsrc, ((0, 0), (0, 0), (0, 0), (0, np_ - n))).reshape(
        b, vq, nc * np_
    )
    wct = jnp.pad(
        jnp.swapaxes(wc, 1, 2), ((0, 0), (0, np_ - n), (0, 0))
    ).astype(src.dtype)
    ds = _stencil_run(gp, rev_qids, rev_src_ids, wct, nc, t_tile, w_win,
                      method)
    ds = ds.astype(src.dtype)

    # d_wc[j] = Σ_q,c src[pos(qids[j,q])][chunk c]ᵀ g[q][chunk c]: ranks
    # resolved ONCE here (training-only cost), one offset at a time
    # (lax.map bounds the gather working set at (Vq, nc·kzp)).
    ranks = jax.vmap(_lookup_ranks)(src_ids, qids)

    def per_offset(rj):
        def one(s, r, gg):
            ok = r >= 0
            rows = s[jnp.clip(r, 0, s.shape[0] - 1)]
            rows = rows * ok[:, None].astype(s.dtype)
            return jnp.einsum(
                "qck,qcn->kn",
                rows.reshape(vq, nc, kzp),
                gg.reshape(vq, nc, n),
                preferred_element_type=jnp.float32,
            )

        return jax.vmap(one)(src, rj, g).sum(0)

    dwc = jax.lax.map(per_offset, jnp.swapaxes(ranks, 0, 1))
    return ds, None, None, dwc.astype(wc.dtype), None, None


stencil_conv_batched.defvjp(_stencil_fwd, _stencil_bwd)


def subm_conv_columns_batched(colf, cols: ColumnSet, w,
                              method: str = "auto",
                              t_tile: Optional[int] = None,
                              w_win: Optional[int] = None):
    """Batched submanifold 3³ conv — the TPU fast path of
    ``subm_conv_columns`` (same math; one fused kernel per layer). Neighbor
    matching is by COLUMN ID inside the kernel — no rank resolution.

    colf: (B, Vc, nz, C); w: (27, C, Cout).
    Tiling defaults adapt to the chunked source width: narrow sources
    (nc·kzp ≤ 256 — e.g. the C3 stage-0 input layer) are per-grid-step
    overhead-bound and take t512/w640 (measured 9.7 → 7.6 ms at FHD);
    wide sources take t256/w384 (larger windows exceed the 16 MB scoped
    VMEM: the v5e compiler OOMs at w≥768 with 768-lane sources).
    Returns (B, Vc, nz, Cout) f32.
    """
    bsz, vc, nz, cin = colf.shape
    cout = w.shape[-1]
    plan = _chunk_plan(cin, nz, 1)
    if t_tile is None:
        t_tile, w_win = (512, 640) if plan.nc * plan.kzp <= 256 else (256, 384)
    fm = colf * cols.mask[..., None].astype(colf.dtype)
    src = jax.vmap(lambda f: _chunk_source(f, plan, 1))(fm)
    wc = _chunk_weights(w.reshape(9, 3, cin, cout), plan, 1)
    qids = jax.vmap(subm_qids_one)(cols)
    # Submanifold reverse queries are the offset-flipped forward queries:
    # rev[j, v] = id_v − δ_j = qids[8−j, v] (the 9 BEV offsets of
    # _bev_offsets2d are negation-symmetric under j ↦ 8−j).
    out = stencil_conv_batched(src, qids, cols.col_ids, wc, plan.nc, t_tile,
                               w_win, method, rev_qids=qids[:, ::-1],
                               rev_src_ids=cols.col_ids)
    out = out.reshape(bsz, vc, plan.nc * plan.z, cout)
    return out[:, :, :nz]


def strided_conv_columns_batched(colf, in_cols: ColumnSet,
                                 out_cols: ColumnSet, w,
                                 method: str = "auto",
                                 t_tile: int = 128, w_win: int = 384,
                                 mask_t_tile: int = 1024,
                                 mask_w_win: int = 3072):
    """Batched k=3 s=2 p=1 strided conv — TPU fast path of
    ``strided_conv_columns``. Neighbor matching is by COLUMN ID inside the
    kernel (query ids are arithmetic on the output coords; no rank
    resolution). Returns ((B, Vco, nzo, Cout) f32 features, (B, Vco, nzo)
    bool out mask)."""
    bsz, vc, nz, cin = colf.shape
    vco = out_cols.col_ids.shape[1]
    nzo = out_cols.nz
    cout = w.shape[-1]
    nx, ny = in_cols.bev_shape
    offs = _bev_offsets2d()

    onx, ony = out_cols.bev_shape

    def qids_one(oc_ids, oc_valid):
        coords = jnp.stack([oc_ids % onx, oc_ids // onx], -1)
        q = coords[None, :, :] * 2 + offs[:, None, :]
        inb = (
            oc_valid[None, :]
            & (q[..., 0] >= 0) & (q[..., 0] < nx)
            & (q[..., 1] >= 0) & (q[..., 1] < ny)
        )
        return jnp.where(inb, q[..., 1] * nx + q[..., 0], -1)

    qids = jax.vmap(qids_one)(out_cols.col_ids, out_cols.valid)  # (B, 9, Vco)

    # Reverse queries for the fused backward: input column v is read by the
    # (unique) output q with 2·coord(q) + δ_j = coord(v), i.e.
    # coord(q) = (coord(v) − δ_j)/2 where both components divide evenly.
    def rev_qids_one(ic_ids, ic_valid):
        coords = jnp.stack([ic_ids % nx, ic_ids // nx], -1)
        t = coords[None, :, :] - offs[:, None, :]
        even = (t[..., 0] % 2 == 0) & (t[..., 1] % 2 == 0)
        qc = t // 2
        inb = (
            ic_valid[None, :] & even
            & (qc[..., 0] >= 0) & (qc[..., 0] < onx)
            & (qc[..., 1] >= 0) & (qc[..., 1] < ony)
        )
        return jnp.where(inb, qc[..., 1] * onx + qc[..., 0], -1)

    rev_qids = jax.vmap(rev_qids_one)(
        in_cols.col_ids, in_cols.valid
    )  # (B, 9, Vc)

    plan = _chunk_plan(cin, nzo, 2)
    fm = colf * in_cols.mask[..., None].astype(colf.dtype)
    src = jax.vmap(lambda f: _chunk_source(f, plan, 2))(fm)
    wc = _chunk_weights(w.reshape(9, 3, cin, cout), plan, 2)
    out = stencil_conv_batched(src, qids, in_cols.col_ids, wc, plan.nc,
                               t_tile, w_win, method, rev_qids=rev_qids,
                               rev_src_ids=out_cols.col_ids)
    out = out.reshape(bsz, vco, plan.nc * plan.z, cout)[:, :, :nzo]

    # Output activity through the same machinery on the 1-channel mask
    # (no narrow-lane gathers): count active inputs per 3³ window. The
    # 128-lane mask source makes per-grid-step overhead, not compute, the
    # cost — so it gets its own MUCH coarser tiling.
    mplan = _chunk_plan(1, nzo, 2)
    msrc = jax.vmap(
        lambda m: _chunk_source(m[..., None].astype(colf.dtype), mplan, 2)
    )(in_cols.mask)
    mwc = _chunk_weights(
        jnp.ones((9, 3, 1, 1), colf.dtype), mplan, 2
    )
    mm = stencil_conv_batched(msrc, qids, in_cols.col_ids, mwc, mplan.nc,
                              mask_t_tile, mask_w_win, method)
    mm = mm.reshape(bsz, vco, mplan.nc * mplan.z)[:, :, :nzo]
    omask = (mm > 0.5) & out_cols.valid[:, :, None]
    return out, omask


# ---------------------------------------------------------------------------
# Z-SLAB UNITS (round 3): the occupancy-proportional refinement of columns.
#
# At FHD geometry (max_points_per_voxel=1, 60k voxels over 1984²×40) a BEV
# column holds ~1.01 voxels on average, so the dense-z column formulation
# computes ~40 z-cells per active voxel. A UNIT is one fixed z-slab of a
# column — id = (y·nx + x)·NC + slab with NC = ceil(nz / z_slab) — and only
# ACTIVE units (≥1 voxel in the slab) are stored. Unit count ≈ column count
# at low occupancy while per-unit work shrinks by nz/z_slab, cutting both
# the kernel's one-hot gather width (nc·kzp → one slab's kzp) and the
# banded contraction ~4-10× per layer at FHD.
#
# Everything reuses the column machinery: a unit set IS a ColumnSet over
# the VIRTUAL BEV grid (nx·NC, ny) with virtual x = x·NC + slab (ids stay
# sorted, dy-band monotonicity holds, window prep/kernel/banded weights are
# untouched; nc=1 always). BEV stencil offsets become (±NC, ±1) virtual
# shifts; the slab index is invariant under them. The z halo between
# vertically adjacent slabs of one column is exactly the array-index ±1
# neighbor (unit ids differ by 1 ⇔ same column, adjacent slab), so halo
# rows are validity-masked shifts — no gather.
#
# Slab sizes must halve across strided (s=2) stages so input slab c maps
# exactly onto output slab c: output cell oz ∈ [zo·c, zo·(c+1)) reads input
# rows [2·zo·c − 1, 2·zo·(c+1) − 1) = input slab c plus ONE top-halo row.
# Only a slab's LAST cell spills activity into output slab c+1 (odd global
# z feeds two outputs, even z feeds one — downsample_units refines
# candidates with that cell's mask).
# ---------------------------------------------------------------------------


def _unit_nc(nz: int, z_slab: int) -> int:
    return -(-nz // z_slab)


def _even_select(sorted_vals, num_unique, cap: int, k=None):
    """Evenly-spread cap selection over an ascending-unique prefix.

    ``sorted_vals`` carries ``num_unique`` real entries ascending at the
    front, padding behind (callers guarantee ``len >= cap``). Returns the
    (cap,) selected POSITIONS — identity when ``num_unique <= cap``, else
    an evenly rank-spaced subsample. Strictly increasing, so gathered
    values stay ascending-unique. Mirrors ops/voxelize.py's overflow
    policy: a truncated sorted PREFIX is a spatial band (low y at this id
    order) that both biases coverage and concentrates survivors into a
    locally-dense region — measured at FHD stage 2, the dense band blew
    every stencil window into the slow cond fallback (whole-batch XLA
    reference), 3.4 vs ~20 samples/s e2e."""
    if k is None:
        k = jnp.arange(cap, dtype=jnp.int32)
    stride = jnp.maximum(num_unique // cap, 1).astype(jnp.int32)
    rem = jnp.maximum(num_unique - stride * cap, 0).astype(jnp.int32)
    return jnp.where(num_unique > cap, k * stride + jnp.minimum(k, rem), k)


def _insert_ghosts(unit_ids, unit_valid, first_occ, last_occ, ncs: int,
                   bigu, unit_cap: int):
    """Merge real units with their ghost ids into a ``unit_cap``-row set.

    ID-ONLY: takes per-unit boundary-occupancy bits (``first_occ`` /
    ``last_occ`` — cell 0 / cell z_slab−1 active) instead of the feature
    expansion, and returns (final_ids, final_valid, out_pos) where
    ``out_pos[i]`` is the OUTPUT row of input unit rank i (``unit_cap``
    for dropped rows). The caller scatters voxel features straight into
    the final (unit_cap, z_slab, C) layout through ``out_pos`` — the
    earlier interface materialized an intermediate (V, z_slab, C)
    expansion here and re-gathered it through a src map, two serial
    row-gather passes (~50 ms of the 53 ms units_from_voxels cost at FHD
    batch-4) that one direct scatter replaces.

    Why ghosts: a submanifold/strided read at a cross-column query
    (col±δ, c) reaches (col±δ, c)'s halo rows — which carry
    (col±δ, c∓1)'s boundary cells. If the aligned unit (col±δ, c) is
    inactive, the id match finds nothing and the contribution is lost.
    So every unit whose FIRST cell is active demands an (empty) unit one
    slab below, and every unit whose LAST cell is active demands one
    above; ghost rows are zero (their halo fills at conv time) with
    all-false masks, so they never cascade.

    ``unit_ids`` arrives sorted UNIQUE ascending (head-compacted by the
    caller), so the merged sequence {ids} ∪ {ghosts id±1} is built
    POSITIONALLY — no sort at all: each real unit emits 1-3 ordered
    entries ([id−1,] id[, id+1]) after ghost dedup against its literal
    neighbors, an exclusive cumsum of the emit counts assigns every
    entry its final rank, and three scalar scatters place (id, src)
    into a compacted buffer. Earlier formulations paid two 3V-length
    (id, payload) pair sorts here — ≈ 20 ms at FHD batch-4, ~all of
    units_from_voxels' cost — vs ~1-2 ms for the cumsum + scatters.
    """
    v = unit_ids.shape[0]
    slab = unit_ids % ncs
    need_lo = unit_valid & first_occ & (slab != 0)
    need_hi = unit_valid & last_occ & (slab != ncs - 1)
    prev_ids = jnp.concatenate([jnp.full((1,), bigu, jnp.int32),
                                unit_ids[:-1]])
    next_ids = jnp.concatenate([unit_ids[1:],
                                jnp.full((1,), bigu, jnp.int32)])
    prev_hi = jnp.concatenate([jnp.zeros((1,), bool), need_hi[:-1]])
    # id−1 is covered when the previous REAL unit is id−1, or when its
    # hi-ghost (emitted at rank P[i−1]+…) is id−1 (prev real id−2).
    emit_lo = need_lo & ~(
        (prev_ids == unit_ids - 1) | ((prev_ids == unit_ids - 2) & prev_hi)
    )
    # id+1 is covered by a REAL next unit; a duplicate lo-ghost of the
    # next unit (next real id+2 needing its id+1) is dropped THERE by
    # the emit_lo rule, keeping this hi-ghost as the single copy.
    emit_hi = need_hi & ~(next_ids == unit_ids + 1)
    cnt = jnp.where(unit_valid,
                    1 + emit_lo.astype(jnp.int32) + emit_hi.astype(jnp.int32),
                    0)
    pos = jnp.cumsum(cnt) - cnt  # exclusive prefix: rank of entry group i
    total = pos[-1] + cnt[-1]
    buf_len = max(3 * v, unit_cap)
    park = jnp.int32(buf_len)
    dest_real = jnp.where(unit_valid, pos + emit_lo, park)
    dest_lo = jnp.where(emit_lo, pos, park)
    dest_hi = jnp.where(emit_hi, pos + 1 + emit_lo, park)
    buf_ids = (
        jnp.full((buf_len,), bigu, jnp.int32)
        .at[dest_real].set(unit_ids, mode="drop", unique_indices=True)
        .at[dest_lo].set(unit_ids - 1, mode="drop", unique_indices=True)
        .at[dest_hi].set(unit_ids + 1, mode="drop", unique_indices=True)
    )
    # Cap overflow: evenly-spread survivors (see _even_select), not the
    # lowest-id prefix.
    sel = _even_select(buf_ids, total, unit_cap)
    final_ids = buf_ids[sel]
    final_valid = final_ids < bigu
    # Output row of each input unit rank: invert sel over the buffer
    # (scalar scatter), then read it at the unit's buffer position.
    inv_sel = jnp.full((buf_len + 1,), unit_cap, jnp.int32).at[sel].set(
        jnp.arange(unit_cap, dtype=jnp.int32), mode="drop",
        unique_indices=True,
    )
    out_pos = inv_sel[jnp.minimum(dest_real, buf_len)]
    return final_ids, final_valid, out_pos


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def units_from_voxels(features, active: ActiveSet, z_slab: int,
                      assume_sorted: bool = False,
                      unit_cap: Optional[int] = None):
    """(V, C) voxel features + 3D active set → (unit ColumnSet over the
    (nx·NC, ny) virtual BEV grid, (unit_cap, z_slab, C) unit features).

    Mirrors ``columns_from_voxels`` with the unit key col·NC + z//z_slab
    (monotone in the voxelize order (y·nx+x)·nz + z, so ``assume_sorted``
    applies identically); per-unit windows span ≤ z_slab rows, making the
    placement one-hot (z_slab² vs nz²) ~25× smaller at FHD stage 0.

    The set includes GHOST units (empty, all-false mask) wherever a
    boundary-active cell must be readable through a z-neighbor's halo
    (see ``_insert_ghosts``). ``unit_cap`` defaults to V + V/4 — at
    uniform z a voxel sits on a slab boundary with probability 2/z_slab.
    """
    nx, ny, nz = active.spatial_shape
    ncs = _unit_nc(nz, z_slab)
    v, c = features.shape
    if unit_cap is None:
        unit_cap = v + v // 4
    big2 = nx * ny
    bigu = big2 * ncs  # virtual BEV volume
    assert big2 * nz < 2 ** 30 and bigu < PAD_ID, (nx, ny, nz, ncs)
    bev = active.coords[:, 1] * nx + active.coords[:, 0]
    key = jnp.where(active.valid, bev * nz + active.coords[:, 2],
                    jnp.int32(big2 * nz))
    if assume_sorted:
        skey, f_s = key, features
    else:
        skey, perm = jax.lax.sort(
            (key, jnp.arange(v, dtype=jnp.int32)), num_keys=1
        )
        f_s = features[perm]
    valid_s = skey < big2 * nz
    z_s = skey % nz
    # Unit id in the virtual grid; invalid rows park at bigu.
    uid_s = jnp.where(valid_s, (skey // nz) * ncs + z_s // z_slab,
                      jnp.int32(bigu))
    zl_s = z_s - (z_s // z_slab) * z_slab  # local z within the slab
    head = (
        jnp.concatenate([jnp.ones((1,), bool), uid_s[1:] != uid_s[:-1]])
        & valid_s
    )
    urank = jnp.cumsum(head.astype(jnp.int32)) - 1
    arange_v = jnp.arange(v, dtype=jnp.int32)
    target = jnp.where(head, urank, v)
    unit_ids = jnp.full((v,), bigu, jnp.int32).at[target].set(
        uid_s, mode="drop", unique_indices=True
    )
    unit_valid = unit_ids < bigu
    # Per-unit boundary-occupancy bits for the ghost rule: within a unit
    # the sorted z's ascend, so the HEAD voxel holds the smallest local z
    # (cell 0 occupied iff its zl == 0) and the TAIL voxel the largest
    # (cell z_slab−1 occupied iff its zl == z_slab−1).
    # Tail = last voxel of its unit: the NEXT row's uid differs (padding
    # rows park at bigu, so the valid→padding boundary fires too — using
    # head[1:] here would AND in the next row's validity and silently
    # drop the LAST unit's tail whenever padding follows it).
    tail = (
        jnp.concatenate([uid_s[1:] != uid_s[:-1], jnp.ones((1,), bool)])
        & valid_s
    )
    target_t = jnp.where(tail, urank, v)
    first_occ = jnp.zeros((v,), bool).at[target].set(
        zl_s == 0, mode="drop", unique_indices=True
    )
    last_occ = jnp.zeros((v,), bool).at[target_t].set(
        zl_s == z_slab - 1, mode="drop", unique_indices=True
    )
    final_ids, final_valid, out_pos = _insert_ghosts(
        unit_ids, unit_valid, first_occ, last_occ, ncs, bigu, unit_cap
    )
    # Placement into the final ghost-merged layout: each sorted voxel row
    # lands in exactly one (output unit row, local z) cell, and ``dest``
    # is ASCENDING-UNIQUE over the valid prefix (out_pos increases with
    # unit rank, local z increases within a unit) with invalid rows at
    # the tail — exactly ``fill_rows_by_id``'s presorted contract. On TPU
    # that routes through the Pallas tile-one-hot fill (the row scatter
    # measured 11.5 ms at the 60k-row/600k-canvas batch-4 shape — XLA's
    # serial per-row path — vs one-hot matmul tiles); an appended
    # ones-channel yields the occupancy mask from the same fill, deleting
    # the separate mask scatter. (The earlier pipeline materialized an
    # intermediate (V, z_slab, C) expansion by row gather and re-gathered
    # it through a src map — ~50 ms; the original per-unit window
    # formulation — vmap(dynamic_slice) + one-hot einsum — cost ~995 ms,
    # scripts/profile_ufv_parts.py.)
    from lyft3d_tpu.ops.dense_fill import fill_rows_by_id

    row = out_pos[jnp.minimum(urank, v - 1)]
    place_ok = valid_s & (row < unit_cap)
    dest = jnp.where(place_ok, row * z_slab + zl_s,
                     jnp.int32(unit_cap * z_slab))
    f_aug = jnp.concatenate(
        [f_s, jnp.ones((v, 1), f_s.dtype)], axis=-1
    )
    canvas = unit_cap * z_slab
    method = ("pallas" if jax.default_backend() == "tpu"
              and canvas <= 2 ** 20 else "scatter")
    filled = fill_rows_by_id(f_aug, dest, place_ok, canvas,
                             assume_sorted=True, method=method)
    f_out = filled[:, :c].reshape(unit_cap, z_slab, c)
    m_out = (filled[:, c] > 0).reshape(unit_cap, z_slab)
    cols = ColumnSet(col_ids=final_ids, valid=final_valid, mask=m_out,
                     bev_shape=(nx * ncs, ny), nz=z_slab)
    return cols, f_out


def _ufv_fwd(features, active: ActiveSet, z_slab: int, assume_sorted: bool,
             unit_cap: Optional[int]):
    out = units_from_voxels.fun(features, active, z_slab, assume_sorted,
                                unit_cap)
    cols, _ = out
    nx, ny, nz = active.spatial_shape
    v = features.shape[0]
    big2 = nx * ny
    bev = active.coords[:, 1] * nx + active.coords[:, 0]
    key = jnp.where(active.valid, bev * nz + active.coords[:, 2],
                    jnp.int32(big2 * nz))
    if assume_sorted:
        perm = None
        skey = key
    else:
        skey, perm = jax.lax.sort(
            (key, jnp.arange(v, dtype=jnp.int32)), num_keys=1
        )
    valid_s = skey < big2 * nz
    z_s = skey % nz
    ncs = _unit_nc(nz, z_slab)
    bigu = jnp.int32(big2 * ncs)
    uid_s = jnp.where(valid_s, (skey // nz) * ncs + z_s // z_slab, bigu)
    # Final row of each voxel's unit: search the (sorted) final id list.
    cap = cols.col_ids.shape[0]
    fpos = jnp.searchsorted(cols.col_ids, uid_s).astype(jnp.int32)
    fpos = jnp.clip(fpos, 0, cap - 1)
    ok = valid_s & (cols.col_ids[fpos] == uid_s)
    zl_s = z_s - (z_s // z_slab) * z_slab
    dt = jnp.zeros((0,), features.dtype)
    return out, (fpos, zl_s, ok, perm, dt)


def _ufv_bwd(z_slab: int, assume_sorted: bool, unit_cap: Optional[int],
             res, ct):
    """Pure gather, like ``_cfv_bwd`` — each voxel lands in one (unit,
    local z) cell; voxels whose unit was cap-truncated get zero grad."""
    fpos, zl_s, ok, perm, dt = res
    _, d_colf = ct
    g = d_colf[fpos, zl_s]
    g = (g * ok[:, None].astype(g.dtype)).astype(dt.dtype)
    if perm is not None:
        g = jnp.zeros_like(g).at[perm].set(g, unique_indices=True)
    return g, None


units_from_voxels.defvjp(_ufv_fwd, _ufv_bwd)


def _unit_halo_rows(fm, ids, valid, ncs: int, bottom: bool):
    """(Vu, zs, C) masked unit features → (Vu, zs + 1 + bottom, C) rows
    with the z halo prepended (and appended when ``bottom``).

    Unit ids are sorted unique ascending, so the slab directly below lives
    at array index i−1 iff ids[i−1] == ids[i] − 1, and the slab index is
    ids % NC — a +1 id step crosses into the next column when slab == NC−1.
    Inactive adjacent slabs contribute zeros (their features are zero by
    the submanifold masking), which is exactly the dense-z semantics.
    """
    vu, zs, c = fm.shape
    zero = jnp.zeros((1, 1, c), fm.dtype)
    below = jnp.concatenate([zero, fm[:-1, -1:]], axis=0)  # (Vu, 1, C)
    ok_b = (
        jnp.concatenate([jnp.zeros((1,), bool), ids[1:] == ids[:-1] + 1])
        & (ids % ncs != 0) & valid
    )
    rows = [below * ok_b[:, None, None].astype(fm.dtype), fm]
    if bottom:
        above = jnp.concatenate([fm[1:, :1], zero], axis=0)
        ok_a = (
            jnp.concatenate([ids[:-1] + 1 == ids[1:], jnp.zeros((1,), bool)])
            & (ids % ncs != ncs - 1) & valid
        )
        rows.append(above * ok_a[:, None, None].astype(fm.dtype))
    return jnp.concatenate(rows, axis=1)


def _unit_rows_padded(fm, ids, valid, ncs: int, bottom: bool):
    """Halo'd unit rows flattened and lane-padded to the 128 multiple the
    stencil kernel wants: (Vu, kzp) with kz = (zs + 1 + bottom)·C."""
    rows = _unit_halo_rows(fm, ids, valid, ncs, bottom)
    vu = rows.shape[0]
    kz = rows.shape[1] * rows.shape[2]
    kzp = -(-kz // 128) * 128
    return jnp.pad(rows.reshape(vu, kz), ((0, 0), (0, kzp - kz)))


def _unit_band_weights(w, zs_out: int, kzrows: int, stride: int, kzp: int):
    """(27, C, Cout) → (9, kzp, zs_out·Cout) single-chunk band weights.
    Row 0 of the halo'd unit rows is local z −1, matching
    ``_banded_weight``'s padded-row convention."""
    cin, cout = w.shape[1], w.shape[2]
    w93 = w.reshape(9, 3, cin, cout)
    wb = jax.vmap(
        lambda wj: _banded_weight(wj, zs_out, kzrows, stride)
    )(w93)
    return jnp.pad(wb, ((0, 0), (0, kzp - wb.shape[1]), (0, 0)))


def unit_qids_subm(cols: ColumnSet, ncs: int):
    """(9, Vu) submanifold neighbor ids — the constant virtual-grid shift
    (dy·nx + dx)·NC per BEV offset; −1 where absent. The virtual x bound
    nx·NC rejects real-grid x over/underflow exactly (slab < NC)."""
    nxv, ny = cols.bev_shape
    offs = _bev_offsets2d()
    q = cols.coords[None, :, :] + offs[:, None, :] * jnp.asarray(
        [ncs, 1], jnp.int32
    )
    inb = (
        cols.valid[None, :]
        & (q[..., 0] >= 0) & (q[..., 0] < nxv)
        & (q[..., 1] >= 0) & (q[..., 1] < ny)
    )
    return jnp.where(inb, q[..., 1] * nxv + q[..., 0], -1)


def subm_conv_units_batched(colf, cols: ColumnSet, w, ncs: int,
                            method: str = "auto",
                            t_tile: Optional[int] = None,
                            w_win: Optional[int] = None):
    """Batched submanifold 3³ conv over z-slab units — same math as
    ``subm_conv_columns_batched`` restricted to active slabs.

    colf: (B, Vu, zs, C); w: (27, C, Cout). Returns (B, Vu, zs, Cout) f32.
    """
    bsz, vu, zs, cin = colf.shape
    cout = w.shape[-1]
    fm = colf * cols.mask[..., None].astype(colf.dtype)
    src = jax.vmap(
        lambda f, i, vv: _unit_rows_padded(f, i, vv, ncs, bottom=True)
    )(fm, cols.col_ids, cols.valid)
    kz = (zs + 2) * cin
    kzp = -(-kz // 128) * 128
    wc = _unit_band_weights(w, zs, zs + 2, 1, kzp)
    if t_tile is None:
        t_tile, w_win = (512, 640) if kzp <= 256 else (256, 384)
    qids = jax.vmap(lambda cc: unit_qids_subm(cc, ncs))(cols)
    out = stencil_conv_batched(src, qids, cols.col_ids, wc, 1, t_tile,
                               w_win, method, rev_qids=qids[:, ::-1],
                               rev_src_ids=cols.col_ids)
    return out.reshape(bsz, vu, zs, cout)


def downsample_units(cols: ColumnSet, ncs: int, max_out: int):
    """Output unit set of a k=3 s=2 p=1 strided conv over z-slab units.

    Candidates per input unit: the ≤4 BEV parent columns × three slabs —
    its own; slab+1 when any of the unit's LAST 3 z cells is active
    (mask[-1] spills real activity into output slab c+1's first cell —
    odd global z feeds two outputs — and activity in rows z_in−3..z_in−1
    makes output (c, last) active, which demands the unit ABOVE as a
    ghost halo carrier, see ``_insert_ghosts``); slab−1 when any of
    the FIRST 2 cells is active (output (c, first) active demands the
    unit below). Output slab size is z_slab/2; NC is invariant. The exact
    per-cell activity mask is filled by ``strided_conv_units_batched``'s
    mask stencil — present-but-inactive rows simply behave as ghosts."""
    nxv, ny = cols.bev_shape
    nx = nxv // ncs
    onx = (nx + 2 - 3) // 2 + 1
    ony = (ny + 2 - 3) // 2 + 1
    zso = max(1, cols.nz // 2)
    obig = jnp.int32(onx * ony * ncs)
    vu = cols.col_ids.shape[0]
    x = cols.coords[:, 0] // ncs
    slab = cols.coords[:, 0] - x * ncs
    yy = cols.coords[:, 1]
    num = jnp.stack([x, yy], -1) + 1  # + padding
    o_hi = num // 2
    o_lo = -((-(num - 2)) // 2)
    up = cols.mask[:, -3:].any(axis=1) & (slab < ncs - 1)
    down = cols.mask[:, :2].any(axis=1) & (slab > 0)

    # One sorted pass over the 4 PARENT combos only (same-slab ds = 0);
    # the gated slab±1 candidates are re-derived AFTER dedup by the same
    # positional 1-3-entry expansion as ``_insert_ghosts`` — this used to
    # be a 12-combo candidate list through TWO full-length sorts (sort +
    # head-compaction sort over 12·Vu), the dominant cost of the strided
    # layers at FHD (honest stage-0 strided: 32 ms/batch-4, ~25 of them
    # here). Now: one (id, flags) pair sort over 4·Vu + cumsum/scatter
    # compaction, ~3-6x less sort work and no second sort.
    combos4 = jnp.asarray(list(itertools.product(range(2), range(2))),
                          jnp.int32)

    def per_combo(j):
        o = o_lo + j[None, :]
        ok = (
            cols.valid
            & jnp.all(o <= o_hi, axis=1)
            & (o[:, 0] >= 0) & (o[:, 0] < onx)
            & (o[:, 1] >= 0) & (o[:, 1] < ony)
        )
        oid = (o[:, 1] * onx + o[:, 0]) * ncs + slab
        flags = jnp.where(ok, up.astype(jnp.int32) * 2 + down.astype(
            jnp.int32), 0)
        return jnp.where(ok, oid, obig), flags

    cand, cfl = jax.vmap(per_combo)(combos4)
    cand, cfl = cand.reshape(-1), cfl.reshape(-1)
    n4 = cand.shape[0]
    # ONE single-array sort with the 2 flag bits packed into the key (the
    # pair sort permutes a payload lane too; obig·4 stays well inside
    # int32). Every scalar scatter at this scale costs ~7 ms through
    # XLA:TPU's serial scatter path, and the old pipeline ran SIX
    # n4-length scatters (par compaction + 2 flag segment-sums + 3 ghost
    # placements) — 55 ms of the 62 ms FHD stage-0 strided layer. Now:
    # flag aggregation is a segmented-OR scan (vector work), parents +
    # flags compact through ONE (n4, 2)-row scatter onto a P-length list,
    # and the ghost expansion's three scatters run at P, not n4.
    skey = jax.lax.sort(jnp.where(cand < obig, cand * 4 + cfl, obig * 4))
    cand = skey // 4
    cfl = skey - cand * 4
    head = jnp.concatenate(
        [jnp.ones((1,), bool), cand[1:] != cand[:-1]]
    ) & (cand < obig)
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1  # segment id per row
    total = seg[-1] + 1  # rows past the last head keep its segment id

    # Segmented OR of the flag bits (reset at heads); the TAIL row of
    # each segment holds the full OR.
    def seg_or(a, b):
        av, ah = a
        bv, bh = b
        return jnp.where(bh, bv, av | bv), ah | bh

    flag_or, _ = jax.lax.associative_scan(
        seg_or, (cfl, head.astype(jnp.int32))
    )
    # Tail = last row of its segment by ID CHANGE (cand parks at obig on
    # invalid rows, so the valid→padding boundary fires); head[1:] would
    # AND in the next row's sub-obig validity and drop the final
    # segment's tail — and with it the highest-id parent — whenever
    # padding rows follow it.
    tail = (
        jnp.concatenate([cand[1:] != cand[:-1], jnp.ones((1,), bool)])
        & (cand < obig)
    )

    # Compacted parent list length: at FHD occupancy each input has
    # ~2.25 parent candidates with little sharing, so unique parents run
    # ~2.25·vu — 3·vu avoids the drop in the common case while still
    # pruning the 4·vu candidate buffer.
    p_cap = min(n4, max(2 * max_out, 3 * vu))
    # Overflow drop: remove every d_period-th RANK (evenly interleaved).
    # A stride/remainder pattern (_even_select's) front-loads the wide
    # spacing and keeps a CONTIGUOUS tail band when stride == 1; that
    # locally-dense id band blows the downstream stencil windows into the
    # whole-batch XLA fallback (measured: stage-0 strided 62 -> 113 ms).
    # Interleaved drops keep the survivor density uniform at any ratio;
    # a handful of floor-rounding leftovers spill past p_cap and are
    # tail-truncated by the slot bound.
    overflow = total > p_cap
    den = jnp.maximum(total - p_cap, 1)
    d_period = jnp.maximum(total // den, 2)
    kept = jnp.where(overflow, seg % d_period != d_period - 1, True)
    slot = jnp.where(overflow, seg - (seg + 1) // d_period, seg)
    # Parents + flags compact through ONE packed single-array SORT, not
    # scatters: kept tails keep their packed (id·4 | flags) key, everything
    # else sinks at obig·4, and the compacted list is a STATIC slice of the
    # sorted result (slot order == id order — both ascend). The r4
    # formulation scattered (cand, flag_or) through two n4-length scalar
    # scatters — 2x7.2 ms at the 300k stage-0 shape (scalar scatters run
    # ~25 µs/1k updates on XLA:TPU, measured v5e-1 batch 4) vs 3.8 ms for
    # the 300k single-array sort.
    keep_row = tail & kept & (slot < p_cap)
    packed = jax.lax.sort(
        jnp.where(keep_row, cand * 4 + flag_or, obig * 4)
    )[:p_cap]
    par = packed // 4
    pfl = jnp.where(par < obig, packed - par * 4, 0)
    pvalid = par < obig
    need_hi = (pfl >= 2) & pvalid
    need_lo = (pfl % 2 > 0) & pvalid
    # Ghost expansion ([id−1,] id [, id+1] with the _insert_ghosts dedup
    # rules) by CONCAT + single-array sort — replaces three p_cap-length
    # ghost-placement scatters (3x~5.4 ms at the 225k stage-0 compacted
    # length) with one 3·p_cap sort (~9.3 ms at 675k); entries are unique
    # by the emit rules, so the sorted prefix is ascending-unique as
    # _even_select requires.
    prev_ids = jnp.concatenate([jnp.full((1,), obig, jnp.int32), par[:-1]])
    next_ids = jnp.concatenate([par[1:], jnp.full((1,), obig, jnp.int32)])
    prev_hi = jnp.concatenate([jnp.zeros((1,), bool), need_hi[:-1]])
    emit_lo = need_lo & ~(
        (prev_ids == par - 1) | ((prev_ids == par - 2) & prev_hi)
    )
    emit_hi = need_hi & ~(next_ids == par + 1)
    total2 = (
        jnp.sum(pvalid.astype(jnp.int32))
        + jnp.sum(emit_lo.astype(jnp.int32))
        + jnp.sum(emit_hi.astype(jnp.int32))
    )
    buf = jax.lax.sort(jnp.concatenate([
        jnp.where(pvalid, par, obig),
        jnp.where(emit_lo, par - 1, obig),
        jnp.where(emit_hi, par + 1, obig),
    ]))
    if buf.shape[0] < max_out:  # tiny configs: _even_select needs len>=cap
        buf = jnp.concatenate([
            buf, jnp.full((max_out - buf.shape[0],), obig, jnp.int32)
        ])
    # Cap overflow: evenly-spread survivors (see _even_select), not the
    # lowest-id prefix.
    out_ids = buf[_even_select(buf, total2, max_out)]
    out_valid = out_ids < obig
    return ColumnSet(
        col_ids=out_ids, valid=out_valid,
        mask=jnp.zeros((max_out, zso), bool),
        bev_shape=(onx * ncs, ony), nz=zso,
    )


def strided_conv_units_batched(colf, in_cols: ColumnSet,
                               out_cols: ColumnSet, w, ncs: int,
                               method: str = "auto",
                               t_tile: int = 256, w_win: int = 768,
                               mask_t_tile: int = 1024,
                               mask_w_win: int = 3072):
    """Batched k=3 s=2 p=1 strided conv over z-slab units.

    Output slab c reads input slab c plus one top-halo row (slabs halve
    with the stride: input rows for output local oz are 2·oz + dz − 1 ∈
    [−1, z_in)). Returns ((B, Vuo, zso, Cout) f32, (B, Vuo, zso) bool).
    """
    bsz, vu, zs, cin = colf.shape
    vuo = out_cols.col_ids.shape[1]
    zso = out_cols.nz
    cout = w.shape[-1]
    nxv, ny = in_cols.bev_shape
    nx = nxv // ncs
    onxv, ony = out_cols.bev_shape
    onx = onxv // ncs
    offs = _bev_offsets2d()

    def qids_one(oc_ids, oc_valid):
        vx = oc_ids % onxv
        ox = vx // ncs
        slab = vx - ox * ncs
        oy = oc_ids // onxv
        qx = ox[None, :] * 2 + offs[:, None, 0]
        qy = oy[None, :] * 2 + offs[:, None, 1]
        inb = (
            oc_valid[None, :]
            & (qx >= 0) & (qx < nx) & (qy >= 0) & (qy < ny)
        )
        return jnp.where(inb, (qy * nx + qx) * ncs + slab[None, :], -1)

    qids = jax.vmap(qids_one)(out_cols.col_ids, out_cols.valid)

    def rev_qids_one(ic_ids, ic_valid):
        vx = ic_ids % nxv
        ix = vx // ncs
        slab = vx - ix * ncs
        iy = ic_ids // nxv
        tx = ix[None, :] - offs[:, None, 0]
        ty = iy[None, :] - offs[:, None, 1]
        even = (tx % 2 == 0) & (ty % 2 == 0)
        qx, qy = tx // 2, ty // 2
        inb = (
            ic_valid[None, :] & even
            & (qx >= 0) & (qx < onx) & (qy >= 0) & (qy < ony)
        )
        return jnp.where(inb, (qy * onx + qx) * ncs + slab[None, :], -1)

    rev_qids = jax.vmap(rev_qids_one)(in_cols.col_ids, in_cols.valid)

    # The output-activity mask rides as ONE extra channel through the
    # SAME stencil pass: input channel cin carries the activity
    # indicator, weight block-diagonal ([w | 0; 0 | ones]) routes it to
    # output channel cout. kzp is unchanged at every FHD stage
    # ((zs+1)·(cin+1) stays under the same 128 multiple), so the mask
    # is computed for free — replacing a second full stencil launch on
    # a 1-channel source padded to 128 lanes (~1/3 of the strided
    # layer's cost before round 3).
    fm = colf * in_cols.mask[..., None].astype(colf.dtype)
    aug = jnp.concatenate(
        [fm, in_cols.mask[..., None].astype(colf.dtype)], axis=-1
    )
    src = jax.vmap(
        lambda f, i, vv: _unit_rows_padded(f, i, vv, ncs, bottom=False)
    )(aug, in_cols.col_ids, in_cols.valid)
    kz = (zs + 1) * (cin + 1)
    kzp = -(-kz // 128) * 128
    w_aug = jnp.zeros((27, cin + 1, cout + 1), w.dtype)
    w_aug = w_aug.at[:, :cin, :cout].set(w)
    w_aug = w_aug.at[:, cin, cout].set(1)
    wc = _unit_band_weights(w_aug, zso, zs + 1, 2, kzp)
    out_full = stencil_conv_batched(src, qids, in_cols.col_ids, wc, 1,
                                    t_tile, w_win, method,
                                    rev_qids=rev_qids,
                                    rev_src_ids=out_cols.col_ids)
    out_full = out_full.reshape(bsz, vuo, zso, cout + 1)
    out = out_full[..., :cout]
    mm = out_full[..., cout]
    omask = (mm > 0.5) & out_cols.valid[:, :, None]
    return out, omask


def units_to_dense_bev(colf, cols: ColumnSet, ncs: int, nz: int):
    """(Vu, zs, C) units → (ny, nx, nz·C) dense BEV (z-major then C),
    matching ``columns_to_dense_bev``: slabs concatenate along z."""
    nxv, ny = cols.bev_shape
    nx = nxv // ncs
    zs = cols.nz
    c = colf.shape[-1]
    dense = columns_to_dense_bev(colf, cols)  # (ny, nx·NC, zs·C)
    dense = dense.reshape(ny, nx, ncs * zs, c)[:, :, :nz]
    return dense.reshape(ny, nx, nz * c)
