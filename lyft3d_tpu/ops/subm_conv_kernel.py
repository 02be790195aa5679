"""Fused submanifold-conv Pallas kernel: gather + contraction in one pass.

The XLA formulation (``ops.sparse_conv.gather_by_rank`` + einsum)
materializes the (K, V, C) neighbor tensor in HBM — ~104 MB per subm layer
at FHD stage-0 scale (K=27, V=60k, C=16), written by the gather and re-read
by the einsum. Here the whole sorted feature table rides in VMEM (60k x 16
f32 = 3.8 MB — all SpMiddleFHD stage widths fit), each grid step gathers
its output tile's neighbors VMEM-locally and contracts on the MXU, and HBM
sees only f_sorted + ranks + the output (~25x less traffic).

Replaces the role of spconv's gather-GEMM rulebook execution
(``second/second/pytorch/models/middle.py`` via spconv SubMConv3d;
SURVEY.md §2.3 N10b). Correctness is exact (same ranks contract as the XLA
path), with none of the fixed-window hazards that sank the round-1
dense-fill formulation — the gather is by explicit rank, not by windowed
binary search.

TOOLCHAIN STATUS (measured on TPU, jax 0.9.0): Mosaic's gather lowering
accepts ONLY the same-shape ``take_along_axis`` form (input, indices and
output all (N, M); ``lowering.py:_gather_lowering_rule``), and even that
form crashes the backend compiler on this target for table-scale operands
(probed: every orientation of (49k, C) row gathers → front-end
NotImplementedError or tpu_compile_helper exit 1). Until in-kernel
arbitrary-row ``tpu.dynamic_gather`` lands, this kernel runs correctly
only under ``interpret=True`` (tests) and ``SubMConvLayer(fused="auto")``
selects the XLA gather+einsum path on TPU (~3.1 ms per stage-0 layer at
V=49152, C=16→16, K=27 — within ~2x of the HBM random-row bound for that
formulation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["subm_conv_pallas"]


def _kernel(ranks_ref, f_ref, w_ref, out_ref, *, k_offsets: int):
    tile = out_ref.shape[0]
    t = pl.program_id(0)
    f = f_ref[:]  # whole (Vp, C) table, VMEM-resident across the grid
    acc = jnp.zeros(out_ref.shape, jnp.float32)

    def body(k, acc):
        idx = ranks_ref[k, t, :]  # (tile,) sorted-order neighbor ranks
        safe = jnp.maximum(idx, 0)
        rows = jnp.take(f, safe, axis=0, fill_value=0)  # (tile, C)
        rows = rows * (idx >= 0)[:, None].astype(rows.dtype)
        return acc + jnp.dot(
            rows, w_ref[k], preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(0, k_offsets, body, acc)
    out_ref[:] = acc.astype(out_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def subm_conv_pallas(f_sorted, ranks, weights, tile: int = 512,
                     interpret: bool = False):
    """out[v] = Σ_k f_sorted[ranks[k, v]] @ weights[k], absent (−1) rows zero.

    Args:
        f_sorted: (V, C) features in sorted-id order (``build_hash`` perm
            applied), any float dtype.
        ranks: (K, V) int32 sorted-order neighbor ranks, −1 = absent
            (``subm_neighbors`` output).
        weights: (K, C, Cout).

    Returns (V, Cout) in ``weights``-promoted f32-accumulated dtype of
    ``f_sorted``.
    """
    v, c = f_sorted.shape
    k, v2 = ranks.shape
    assert v == v2, (v, v2)
    cout = weights.shape[-1]
    n_tiles = -(-v // tile)
    vp = n_tiles * tile
    f_p = jnp.pad(f_sorted, ((0, vp - v), (0, 0)))
    ranks_p = jnp.pad(ranks, ((0, 0), (0, vp - v)), constant_values=-1)
    ranks_3d = ranks_p.reshape(k, n_tiles, tile)

    out = pl.pallas_call(
        partial(_kernel, k_offsets=k),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, n_tiles, tile), lambda t: (0, 0, 0)),
            pl.BlockSpec((vp, c), lambda t: (0, 0)),
            pl.BlockSpec((k, c, cout), lambda t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((vp, cout), f_sorted.dtype),
        interpret=interpret,
    )(ranks_3d, f_p, weights.astype(f_sorted.dtype))
    return out[:v]


def _fwd(f_sorted, ranks, weights, tile, interpret):
    out = subm_conv_pallas(f_sorted, ranks, weights, tile, interpret)
    return out, (f_sorted, ranks, weights)


def _bwd(tile, interpret, res, g):
    """Standard XLA backward (training runs it once per step; the fused
    forward is the inference/bench hot path):
        d f_sorted[ranks[k, v]] += g[v] @ W_k^T   (masked scatter-add)
        d W[k] = gathered_k^T @ g                 (recomputed gather)
    """
    f_sorted, ranks, weights = res
    v, c = f_sorted.shape
    k = ranks.shape[0]
    ok = ranks >= 0
    safe = jnp.clip(ranks, 0, v - 1)
    gathered = f_sorted[safe] * ok[..., None].astype(f_sorted.dtype)  # (K,V,C)
    gf32 = g.astype(jnp.float32)
    dw = jnp.einsum("kvc,vd->kcd", gathered.astype(jnp.float32), gf32)

    contrib = jnp.einsum(
        "vd,kcd->kvc", gf32, weights.astype(jnp.float32)
    ) * ok[..., None]
    df = jnp.zeros((v, c), jnp.float32)
    for ki in range(k):  # K=27 static scatter-adds
        df = df.at[safe[ki]].add(jnp.where(ok[ki, :, None], contrib[ki], 0.0))
    return df.astype(f_sorted.dtype), None, dw.astype(weights.dtype)


subm_conv_pallas.defvjp(_fwd, _bwd)
