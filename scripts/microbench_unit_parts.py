#!/usr/bin/env python
"""Part-by-part timing of one strided/subm UNIT layer at FHD stage-0.

Splits the layer into (a) source prep (halo rows + lane pad), (b) query-id
arithmetic, (c) the fused stencil kernel alone (prepped inputs), and (d)
the whole layer, at several t_tile/w_win points — to locate the gap
between the kernel's theoretical matmul cost and the measured layer time.

Usage: python scripts/microbench_unit_parts.py [batch] [iters]
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
    _unit_band_weights,
    _unit_rows_padded,
    downsample_units,
    stencil_conv_batched,
    strided_conv_units_batched,
    subm_conv_units_batched,
    unit_qids_subm,
    units_from_voxels,
)
from lyft3d_tpu.ops.sparse_conv import ActiveSet

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
V = 60000
NX = NY = 1984
NZ = 40
Z_SLAB = 8
NCS = NZ // Z_SLAB
CIN = 16
COUT = 16
MAX_OUT = 32768


def timed(name, fn, *args, perturb_float=True):
    def rep(args, iters):
        def body(i, acc):
            if perturb_float:
                a0 = jax.tree.map(
                    lambda a: a + i.astype(a.dtype) * 1e-6
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    args[0],
                )
            else:
                a0 = args[0]
            out = fn(a0, *args[1:])
            return acc + jax.tree_util.tree_reduce(
                lambda s, a: s + jnp.sum(jnp.abs(a).astype(jnp.float32))
                if jnp.issubdtype(a.dtype, jnp.floating)
                or jnp.issubdtype(a.dtype, jnp.integer)
                else s,
                out, 0.0,
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(1,))
    float(f(args, 1))
    float(f(args, 1 + ITERS))

    def once(n):
        t0 = time.perf_counter()
        float(f(args, n))
        return time.perf_counter() - t0

    ts = min(once(1) for _ in range(2))
    tl = min(once(1 + ITERS) for _ in range(2))
    ms = (tl - ts) / ITERS * 1000
    print(f"{name:52s}: {ms:8.2f} ms/iter", flush=True)
    return ms


def make_units(seed):
    rng = np.random.RandomState(seed)
    # Surface-like occupancy: ~1 voxel per active column (uniform z).
    coords = np.stack(
        [
            rng.randint(0, NX, V),
            rng.randint(0, NY, V),
            rng.randint(0, NZ, V),
        ],
        axis=1,
    ).astype(np.int32)
    key = (coords[:, 1].astype(np.int64) * NX + coords[:, 0]) * NZ + coords[:, 2]
    order = np.argsort(key)
    coords = coords[order]
    feats = rng.randn(V, CIN).astype(np.float32)
    active = ActiveSet(
        coords=jnp.asarray(coords), valid=jnp.ones((V,), bool),
        spatial_shape=(NX, NY, NZ),
    )
    return jnp.asarray(feats), active


def main():
    feats = []
    actives = []
    for b in range(B):
        f, a = make_units(b)
        feats.append(f)
        actives.append(a)
    feats = jnp.stack(feats)
    active = jax.tree.map(lambda *xs: jnp.stack(xs), *actives)

    cols, colf = jax.jit(
        lambda f, a: jax.vmap(
            lambda ff, aa: units_from_voxels(ff, aa, Z_SLAB, True)
        )(f, a)
    )(feats.astype(jnp.bfloat16), active)
    colf = colf.astype(jnp.bfloat16)
    print(f"units: {colf.shape}, max active "
          f"{int(cols.valid.sum(axis=-1).max())}", flush=True)

    w = jnp.asarray(
        np.random.RandomState(9).randn(27, CIN, COUT), jnp.float32
    ).astype(jnp.bfloat16)

    # ---- subm layer ----
    zs = Z_SLAB
    timed("subm full layer (default tiles)",
          lambda x: subm_conv_units_batched(x, cols, w, NCS), colf)
    fm = colf * cols.mask[..., None].astype(colf.dtype)
    timed("subm src prep (halo+pad)",
          lambda x: jax.vmap(
              lambda f, i, vv: _unit_rows_padded(f, i, vv, NCS, bottom=True)
          )(x * cols.mask[..., None].astype(x.dtype), cols.col_ids,
            cols.valid),
          colf)
    timed("subm qids arithmetic",
          lambda c: jax.vmap(lambda cc: unit_qids_subm(cc, NCS))(c), cols,
          perturb_float=False)
    src = jax.jit(
        lambda x: jax.vmap(
            lambda f, i, vv: _unit_rows_padded(f, i, vv, NCS, bottom=True)
        )(x, cols.col_ids, cols.valid)
    )(fm)
    qids = jax.jit(
        lambda c: jax.vmap(lambda cc: unit_qids_subm(cc, NCS))(c)
    )(cols)
    kzp = -(-((zs + 2) * CIN) // 128) * 128
    wc = _unit_band_weights(w, zs, zs + 2, 1, kzp)
    for tt, ww in ((256, 384), (512, 640), (512, 768), (1024, 1280),
                   (1024, 1536)):
        timed(f"subm stencil only t={tt} w={ww}",
              lambda s, q: stencil_conv_batched(
                  s, q, cols.col_ids, wc, 1, tt, ww, "pallas",
                  rev_qids=q[:, ::-1], rev_src_ids=cols.col_ids,
              ),
              src, qids)
    timed("subm stencil REF (gather-einsum)",
          lambda s, q: stencil_conv_batched(
              s, q, cols.col_ids, wc, 1, 256, 384, "ref",
          ),
          src, qids)

    # ---- strided layer ----
    out_cols = jax.jit(
        lambda c: jax.vmap(lambda cc: downsample_units(cc, NCS, MAX_OUT))(c)
    )(cols)
    print(f"strided out: max active "
          f"{int(out_cols.valid.sum(axis=-1).max())}", flush=True)
    for tt, ww in ((128, 512), (256, 768), (256, 1024), (512, 1536),
                   (1024, 3072)):
        timed(f"strided full layer t={tt} w={ww}",
              lambda x, tt=tt, ww=ww: strided_conv_units_batched(
                  x, cols, out_cols, w, NCS, t_tile=tt, w_win=ww
              ),
              colf)


if __name__ == "__main__":
    main()
