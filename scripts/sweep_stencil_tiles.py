#!/usr/bin/env python
"""Sweep t_tile/w_win for the fused stencil kernel at FHD stage shapes,
and A/B the rank-resolve method (merge vs table) at BEV scale.

Usage: python scripts/sweep_stencil_tiles.py [stage] [mode]
  stage: 0/1/2 (default 0); mode: subm|strided|resolve|all (default all)
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
    column_neighbors,
    stencil_conv_batched,
)
from lyft3d_tpu.ops.sparse_conv import resolve_ids

B = 4
STAGE = int(sys.argv[1]) if len(sys.argv) > 1 else 0
MODE = sys.argv[2] if len(sys.argv) > 2 else "all"
SHAPES = {
    0: (60000, 40, 16, 32768, 1984),
    1: (32768, 20, 32, 16384, 992),
    2: (16384, 10, 64, 8192, 496),
}
V, NZ, C, VO, NXY = SHAPES[STAGE]
ITERS = 8


def timed(name, fn, *args, perturb_idx=0):
    def rep(args, iters):
        def body(i, acc):
            newargs = list(args)
            a = newargs[perturb_idx]
            if jnp.issubdtype(a.dtype, jnp.floating):
                newargs[perturb_idx] = a + i.astype(a.dtype) * 1e-6
            else:
                newargs[perturb_idx] = a + (i % 2).astype(a.dtype)
            out = fn(*newargs)
            return acc + jax.tree_util.tree_reduce(
                lambda s, x: s + jnp.sum(jnp.abs(x).astype(jnp.float32)),
                out, 0.0,
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(1,))
    try:
        float(f(args, 1))
        float(f(args, 1 + ITERS))

        def once(iters):
            t0 = time.perf_counter()
            float(f(args, iters))
            return time.perf_counter() - t0

        ts = min(once(1) for _ in range(2))
        tl = min(once(1 + ITERS) for _ in range(2))
        print(f"{name:46s}: {(tl - ts) / ITERS * 1000:8.2f} ms (batch {B})",
              flush=True)
    except Exception as e:
        print(f"{name:46s}: FAILED {repr(e)[:120]}", flush=True)


def main():
    rng = np.random.RandomState(0)
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
    fm = colf * cols.mask[..., None].astype(colf.dtype)

    if MODE in ("resolve", "all"):
        # subm neighbor resolve: 9 x V queries vs V sorted ids
        offs = _bev_offsets2d()

        def neigh(ci, va, method):
            coords = jnp.stack([ci % NXY, ci // NXY], -1)
            q = coords[None, :, :] + offs[:, None, :]
            inb = (
                va[None, :]
                & (q[..., 0] >= 0) & (q[..., 0] < NXY)
                & (q[..., 1] >= 0) & (q[..., 1] < NXY)
            )
            qids = jnp.where(inb, q[..., 1] * NXY + q[..., 0],
                             jnp.int32(NXY * NXY))
            return resolve_ids(ci, jnp.int32(NXY * NXY), qids, method,
                               volume=NXY * NXY)

        for m in ("merge", "table", "searchsorted"):
            timed(f"subm neighbors resolve [{m}]",
                  lambda ci, va, m=m: jax.vmap(
                      lambda i, v: neigh(i, v, m))(ci, va),
                  cols.col_ids, cols.valid)

    if MODE in ("subm", "all"):
        plan = _chunk_plan(C, NZ, 1)
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32))
        wc = _chunk_weights(w.reshape(9, 3, C, C), plan, 1)
        src = jax.jit(jax.vmap(lambda f: _chunk_source(f, plan, 1)))(fm)
        nb = jax.jit(lambda c: jax.vmap(column_neighbors)(c))(cols)
        print(f"subm plan: z={plan.z} kzp={plan.kzp} nc={plan.nc} "
              f"src {src.shape}", flush=True)
        for t, wn in ((256, 384), (512, 640), (512, 768), (1024, 1152),
                      (2048, 2176)):
            timed(f"subm stencil t{t}/w{wn}",
                  lambda s, r, t=t, wn=wn: stencil_conv_batched(
                      s, r, wc, plan.nc, t, wn, "pallas"),
                  src, nb)

    if MODE in ("strided", "all"):
        oids = np.stack([
            np.sort(rng.choice((NXY // 2) ** 2, VO, replace=False)).astype(
                np.int32)
            for _ in range(B)
        ])
        onx = NXY // 2
        offs = _bev_offsets2d()
        big2 = jnp.int32(NXY * NXY)

        def ranks_fn(oc_ids, ic_ids):
            coords = jnp.stack([oc_ids % onx, oc_ids // onx], -1)
            q = coords[None, :, :] * 2 + offs[:, None, :]
            inb = (
                (q[..., 0] >= 0) & (q[..., 0] < NXY)
                & (q[..., 1] >= 0) & (q[..., 1] < NXY)
            )
            qids = jnp.where(inb, q[..., 1] * NXY + q[..., 0], big2)
            return resolve_ids(ic_ids, big2, qids, "table", volume=NXY * NXY)

        ranks = jax.jit(jax.vmap(ranks_fn))(jnp.asarray(oids), cols.col_ids)
        nzo = (NZ + 2 - 3) // 2 + 1
        plan = _chunk_plan(C, nzo, 2)
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32))
        wc = _chunk_weights(w.reshape(9, 3, C, C), plan, 2)
        src = jax.jit(jax.vmap(lambda f: _chunk_source(f, plan, 2)))(fm)
        print(f"strided plan: z={plan.z} kzp={plan.kzp} nc={plan.nc} "
              f"src {src.shape}", flush=True)
        for t, wn in ((128, 256), (256, 512), (512, 1024), (1024, 2048)):
            timed(f"strided stencil t{t}/w{wn}",
                  lambda s, r, t=t, wn=wn: stencil_conv_batched(
                      s, r, wc, plan.nc, t, wn, "pallas"),
                  src, ranks)

        mplan = _chunk_plan(1, nzo, 2)
        mwc = _chunk_weights(jnp.ones((9, 3, 1, 1), colf.dtype), mplan, 2)
        msrc = jax.jit(jax.vmap(
            lambda m: _chunk_source(m[..., None].astype(colf.dtype), mplan, 2)
        ))(cols.mask)
        for t, wn in ((128, 256), (512, 1024), (1024, 2048), (2048, 4096)):
            timed(f"mask stencil t{t}/w{wn}",
                  lambda s, r, t=t, wn=wn: stencil_conv_batched(
                      s, r, mwc, mplan.nc, t, wn, "pallas"),
                  msrc, ranks)


if __name__ == "__main__":
    main()
