#!/usr/bin/env python
"""Tile sweep for NARROW-source stencil layers (small nc*kzp): the C3->16
stage-0 subm layer is per-grid-step-overhead-bound, and its 128-lane source
may admit much larger tiles than the 768-lane layers (which crash the
backend compiler above w=640).

Usage: python scripts/sweep_narrow_subm.py
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
    _chunk_plan,
    _chunk_source,
    _chunk_weights,
    stencil_conv_batched,
    subm_qids_one,
)

B = 4
V, NZ, CIN, COUT, NXY = 60000, 40, 3, 16, 1984
ITERS = 8


def timed(name, fn, *args):
    def rep(args, iters):
        def body(i, acc):
            a = list(args)
            a[0] = a[0] + i.astype(a[0].dtype) * 1e-6
            out = fn(*a)
            return acc + jnp.sum(jnp.abs(out).astype(jnp.float32))

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
        print(f"{name:40s}: {(tl - ts) / ITERS * 1000:8.2f} ms (batch {B})",
              flush=True)
    except Exception as e:
        print(f"{name:40s}: FAILED {repr(e)[:90]}", flush=True)


def main():
    rng = np.random.RandomState(0)
    ids = np.stack([
        np.sort(rng.choice(NXY * NXY, V, replace=False)).astype(np.int32)
        for _ in range(B)
    ])
    cols = ColumnSet(
        col_ids=jnp.asarray(ids), valid=jnp.ones((B, V), bool),
        mask=jnp.asarray(rng.rand(B, V, NZ) > 0.3),
        bev_shape=(NXY, NXY), nz=NZ,
    )
    colf = jnp.asarray(rng.randn(B, V, NZ, CIN).astype(np.float32)).astype(
        jnp.bfloat16
    )
    fm = colf * cols.mask[..., None].astype(colf.dtype)
    plan = _chunk_plan(CIN, NZ, 1)
    w = jnp.asarray(rng.randn(27, CIN, COUT).astype(np.float32))
    wc = _chunk_weights(w.reshape(9, 3, CIN, COUT), plan, 1)
    src = jax.jit(jax.vmap(lambda f: _chunk_source(f, plan, 1)))(fm)
    qids = jax.jit(jax.vmap(subm_qids_one))(cols)
    print(f"plan: z={plan.z} kzp={plan.kzp} nc={plan.nc} src {src.shape}",
          flush=True)
    for t, wn in ((256, 384), (512, 640), (1024, 1152), (2048, 2176),
                  (4096, 4224)):
        timed(f"subm C3 stencil t{t}/w{wn}",
              lambda s, q, t=t, wn=wn: stencil_conv_batched(
                  s, q, cols.col_ids, wc, plan.nc, t, wn, "pallas"),
              src, qids)


if __name__ == "__main__":
    main()
