#!/usr/bin/env python
"""Sweep t_tile/w_win for the fused id-matching stencil kernel at FHD
stage shapes, at the layer level (subm_conv_columns_batched /
strided_conv_columns_batched — the shipped entry points).

Usage: python scripts/sweep_stencil_tiles.py [stage] [mode]
  stage: 0/1/2 (default 0); mode: subm|strided|all (default all)
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
    downsample_columns,
    strided_conv_columns_batched,
    subm_conv_columns_batched,
)

B = 4
STAGE = int(sys.argv[1]) if len(sys.argv) > 1 else 0
MODE = sys.argv[2] if len(sys.argv) > 2 else "all"
# (V, NZ, C, VO, NXY) per FHD stage (input shapes of the stage's layers)
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
            a0 = args[0] + i.astype(args[0].dtype) * 1e-6
            out = fn(a0, *args[1:])
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
        print(f"{name:46s}: FAILED {repr(e)[:160]}", flush=True)


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
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)

    if MODE in ("subm", "all"):
        for t, wn in ((128, 256), (192, 320), (256, 384), (256, 512),
                      (384, 512), (512, 640)):
            timed(
                f"subm V{V} nz{NZ} C{C} t{t}/w{wn}",
                lambda f, t=t, wn=wn: subm_conv_columns_batched(
                    f, cols, w, method="pallas", t_tile=t, w_win=wn
                ),
                colf,
            )

    if MODE in ("strided", "all"):
        out_cols = jax.jit(
            jax.vmap(lambda c: downsample_columns(c, VO))
        )(cols)
        for t, wn in ((64, 192), (128, 256), (128, 384), (256, 512),
                      (256, 768)):
            timed(
                f"strided V{V}->{VO} C{C} t{t}/w{wn}",
                lambda f, t=t, wn=wn: strided_conv_columns_batched(
                    f, cols, out_cols, w, method="pallas",
                    t_tile=t, w_win=wn,
                )[0],
                colf,
            )
        for mt, mw in ((512, 1536), (1024, 3072), (2048, 6144)):
            timed(
                f"strided mask-tile V{V}->{VO} C{C} mt{mt}/mw{mw}",
                lambda f, mt=mt, mw=mw: strided_conv_columns_batched(
                    f, cols, out_cols, w, method="pallas",
                    mask_t_tile=mt, mask_w_win=mw,
                )[0],
                colf,
            )


if __name__ == "__main__":
    main()
