#!/usr/bin/env python
"""Decompose the stage-2 StridedColumnLayer (C64, V16384->8192, nz10->5):
downsample, chunk_source, feature stencil, mask stencil, norm — plus a
pallas-vs-ref A/B and a fallback-taken probe."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lyft3d_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.ops import column_sparse as cs

B = 4
V, NZ, C, VO, NXY = 16384, 10, 64, 8192, 496
ITERS = 8


def timed(name, fn, *args):
    def rep(args, iters):
        def body(i, acc):
            a = list(args)
            a[0] = a[0] + i.astype(a[0].dtype) * 1e-6
            out = fn(*a)
            return acc + jax.tree_util.tree_reduce(
                lambda s, x: s + jnp.sum(jnp.abs(x).astype(jnp.float32)),
                out, 0.0)

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
    print(f"{name:44s}: {(tl - ts) / ITERS * 1000:8.2f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    ids = np.stack([
        np.sort(rng.choice(NXY * NXY, V, replace=False)).astype(np.int32)
        for _ in range(B)
    ])
    cols = cs.ColumnSet(
        col_ids=jnp.asarray(ids), valid=jnp.ones((B, V), bool),
        mask=jnp.asarray(rng.rand(B, V, NZ) > 0.3),
        bev_shape=(NXY, NXY), nz=NZ,
    )
    colf = jnp.asarray(rng.randn(B, V, NZ, C).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32))

    out_cols = jax.jit(
        lambda c: jax.vmap(lambda cc: cs.downsample_columns(cc, VO))(c)
    )(cols)

    # full layer op
    timed("strided_conv_columns_batched (full)",
          lambda f: cs.strided_conv_columns_batched(f, cols, out_cols, w),
          colf)

    # pieces
    plan = cs._chunk_plan(C, out_cols.nz, 2)
    print(f"plan z={plan.z} kzrows={plan.kzrows} kzp={plan.kzp} nc={plan.nc}")
    fm = colf * cols.mask[..., None].astype(colf.dtype)
    wc = cs._chunk_weights(w.reshape(9, 3, C, C), plan, 2)
    timed("chunk_source",
          lambda f: jax.vmap(lambda x: cs._chunk_source(x, plan, 2))(f), fm)
    src = jax.jit(jax.vmap(lambda x: cs._chunk_source(x, plan, 2)))(fm)

    onx, ony = out_cols.bev_shape
    offs = cs._bev_offsets2d()

    def qids_one(oc_ids, oc_valid):
        coords = jnp.stack([oc_ids % onx, oc_ids // onx], -1)
        q = coords[None, :, :] * 2 + offs[:, None, :]
        inb = (
            oc_valid[None, :]
            & (q[..., 0] >= 0) & (q[..., 0] < NXY)
            & (q[..., 1] >= 0) & (q[..., 1] < NXY)
        )
        return jnp.where(inb, q[..., 1] * NXY + q[..., 0], -1)

    qids = jax.jit(jax.vmap(qids_one))(out_cols.col_ids, out_cols.valid)

    # fallback probe: does the coverage check pass?
    t_eff, w_eff = 128, 264
    _, _, ok = jax.vmap(
        lambda i, q: cs._window_prep_ids(i, q, t_eff, w_eff)
    )(cols.col_ids, qids)
    print(f"coverage ok (t128/w264): {np.asarray(ok)}")

    timed("feature stencil [pallas]",
          lambda s: cs.stencil_conv_batched(s, qids, cols.col_ids, wc,
                                            plan.nc, 128, 256, "pallas"),
          src)
    timed("feature stencil [ref]",
          lambda s: cs.stencil_conv_batched(s, qids, cols.col_ids, wc,
                                            plan.nc, 128, 256, "ref"),
          src)
    for t, wn in ((256, 512), (512, 1024)):
        timed(f"feature stencil [pallas t{t}/w{wn}]",
              lambda s, t=t, wn=wn: cs.stencil_conv_batched(
                  s, qids, cols.col_ids, wc, plan.nc, t, wn, "pallas"),
              src)

    mplan = cs._chunk_plan(1, out_cols.nz, 2)
    mwc = cs._chunk_weights(jnp.ones((9, 3, 1, 1), colf.dtype), mplan, 2)
    msrc = jax.jit(jax.vmap(
        lambda m: cs._chunk_source(m[..., None].astype(colf.dtype), mplan, 2)
    ))(cols.mask)
    timed("mask stencil [pallas t1024/w2048]",
          lambda s: cs.stencil_conv_batched(s, qids, cols.col_ids, mwc,
                                            mplan.nc, 1024, 2048, "pallas"),
          msrc)


if __name__ == "__main__":
    main()
