#!/usr/bin/env python
"""Decompose one StridedColumnLayer at FHD stage shapes: downsample
(sort-unique), rank resolution, feature stencil, mask stencil — plus raw
lax.sort costs at the relevant sizes.

Usage: python scripts/microbench_strided_parts.py [stage]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lyft3d_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.ops.column_sparse import (
    ColumnSet,
    _bev_offsets2d,
    _chunk_plan,
    _chunk_source,
    _chunk_weights,
    downsample_columns,
    stencil_conv_batched,
)
from lyft3d_tpu.ops.sparse_conv import resolve_ids

B = 4
STAGE = int(sys.argv[1]) if len(sys.argv) > 1 else 0
# (V_in, nz, C, V_out, bev_n)
SHAPES = {
    0: (60000, 40, 16, 32768, 1984),
    1: (32768, 20, 32, 16384, 992),
    2: (16384, 10, 64, 8192, 496),
}
V, NZ, C, VO, NXY = SHAPES[STAGE]
ITERS = 8


def timed(name, fn, *args):
    def rep(args, iters):
        def body(i, acc):
            out = fn(*jax.tree.map(
                lambda a: a + (i % 2).astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.integer) and a.ndim > 0 else a,
                args))
            return acc + jax.tree_util.tree_reduce(
                lambda s, a: s + jnp.sum(jnp.abs(a).astype(jnp.float32)), out, 0.0
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(1,))
    float(f(args, 1))
    float(f(args, 1 + ITERS))

    def once(iters):
        t0 = time.perf_counter()
        float(f(args, iters))
        return time.perf_counter() - t0

    ts = min(once(1) for _ in range(2))
    tl = min(once(1 + ITERS) for _ in range(2))
    print(f"{name:38s}: {(tl - ts) / ITERS * 1000:8.2f} ms (batch {B})",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    # Active columns: V random distinct BEV cells, sorted.
    ids = np.stack([
        np.sort(rng.choice(NXY * NXY, V, replace=False)).astype(np.int32)
        for _ in range(B)
    ])
    cols = ColumnSet(
        col_ids=jnp.asarray(ids),
        valid=jnp.ones((B, V), bool),
        mask=jnp.asarray(rng.rand(B, V, NZ) > 0.3),
        bev_shape=(NXY, NXY),
        nz=NZ,
    )
    colf = jnp.asarray(rng.randn(B, V, NZ, C).astype(np.float32)).astype(
        jnp.bfloat16
    )

    # raw sort costs
    cand = jnp.asarray(rng.randint(0, NXY * NXY, (B, 4 * V)).astype(np.int32))
    timed("lax.sort 4V int32 (x2 in downsample)",
          lambda c: jax.vmap(jnp.sort)(c), cand)

    timed("downsample_columns",
          lambda ci, va: jax.vmap(
              lambda i, v: downsample_columns(
                  ColumnSet(col_ids=i, valid=v,
                            mask=jnp.zeros((V, NZ), bool),
                            bev_shape=(NXY, NXY), nz=NZ),
                  VO)
          )(ci, va),
          cols.col_ids, cols.valid)

    out_cols = jax.jit(
        lambda ci, va: jax.vmap(
            lambda i, v: downsample_columns(
                ColumnSet(col_ids=i, valid=v, mask=jnp.zeros((V, NZ), bool),
                          bev_shape=(NXY, NXY), nz=NZ), VO)
        )(ci, va)
    )(cols.col_ids, cols.valid)

    offs = _bev_offsets2d()
    onx, ony = out_cols.bev_shape
    big2 = jnp.int32(NXY * NXY)

    def ranks_fn(oc_ids, oc_valid, ic_ids):
        coords = jnp.stack([oc_ids % onx, oc_ids // onx], -1)
        q = coords[None, :, :] * 2 + offs[:, None, :]
        inb = (
            oc_valid[None, :]
            & (q[..., 0] >= 0) & (q[..., 0] < NXY)
            & (q[..., 1] >= 0) & (q[..., 1] < NXY)
        )
        qids = jnp.where(inb, q[..., 1] * NXY + q[..., 0], big2)
        return resolve_ids(ic_ids, big2, qids, None, volume=NXY * NXY)

    timed("ranks resolve (fwd)",
          lambda a, b, c: jax.vmap(ranks_fn)(a, b, c),
          out_cols.col_ids, out_cols.valid, cols.col_ids)

    ranks = jax.jit(lambda a, b, c: jax.vmap(ranks_fn)(a, b, c))(
        out_cols.col_ids, out_cols.valid, cols.col_ids
    )

    nzo = out_cols.nz
    plan = _chunk_plan(C, nzo, 2)
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32))
    wc = _chunk_weights(w.reshape(9, 3, C, C), plan, 2)
    fm = colf * cols.mask[..., None].astype(colf.dtype)
    src = jax.jit(jax.vmap(lambda f: _chunk_source(f, plan, 2)))(fm)
    print(f"  plan: z={plan.z} kzrows={plan.kzrows} kzp={plan.kzp} "
          f"nc={plan.nc}; src {src.shape}", flush=True)

    timed("chunk_source",
          lambda f: jax.vmap(lambda ff: _chunk_source(ff, plan, 2))(f), fm)

    timed("feature stencil kernel",
          lambda s, r: stencil_conv_batched(s, r, wc, plan.nc, 128, 256,
                                            "auto"),
          src, ranks)

    mplan = _chunk_plan(1, nzo, 2)
    mwc = _chunk_weights(jnp.ones((9, 3, 1, 1), colf.dtype), mplan, 2)
    msrc = jax.jit(jax.vmap(
        lambda m: _chunk_source(m[..., None].astype(colf.dtype), mplan, 2)
    ))(cols.mask)
    timed("mask stencil kernel",
          lambda s, r: stencil_conv_batched(s, r, mwc, mplan.nc, 128, 256,
                                            "auto"),
          msrc, ranks)


if __name__ == "__main__":
    main()
