#!/usr/bin/env python
"""A/B the submanifold-conv formulations at FHD stage scale:
XLA gather+einsum vs the fused VMEM-resident pallas kernel
(ops/subm_conv_kernel.py).

Usage: python scripts/microbench_subm.py [V] [C] [Cout] [iters]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.ops.sparse_conv import (
    ActiveSet,
    build_hash,
    gather_by_rank,
    kernel_offsets,
    subm_neighbors,
)
from lyft3d_tpu.ops.subm_conv_kernel import subm_conv_pallas

V = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
C = int(sys.argv[2]) if len(sys.argv) > 2 else 16
COUT = int(sys.argv[3]) if len(sys.argv) > 3 else 16
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 8
SHAPE = (1984, 1984, 40)


def timed(name, fn, *args):
    def rep(args, iters):
        def body(i, acc):
            out = fn(args[0] + i.astype(args[0].dtype) * 1e-6, *args[1:])
            return acc + jnp.sum(jnp.abs(out).astype(jnp.float32))

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
    ms = (tl - ts) / ITERS * 1000
    print(f"{name}: {ms:.2f} ms (V={V}, C={C}->{COUT}, K=27)", flush=True)
    return ms


def main():
    rng = np.random.RandomState(0)
    nx, ny, nz = SHAPE
    # surface-like occupancy: cluster actives in a thin z band
    flat = rng.choice(nx * ny, V, replace=False).astype(np.int64)
    iz = rng.randint(8, 14, V)
    coords = np.stack([flat % nx, (flat // nx) % ny, iz], -1).astype(np.int32)
    active = ActiveSet(jnp.asarray(coords), jnp.ones((V,), bool), SHAPE)
    hash_ = build_hash(active)
    ranks = jax.jit(
        lambda: subm_neighbors(active, hash_, kernel_offsets(3))
    )()
    hit = float((np.asarray(ranks) >= 0).mean())
    print(f"stencil hit rate: {hit:.3f}")

    feats = jnp.asarray(rng.randn(V, C).astype(np.float32))
    f_sorted = feats[hash_[1]]
    w = jnp.asarray(rng.randn(27, C, COUT).astype(np.float32) * 0.05)

    t_xla = timed(
        "xla gather+einsum",
        lambda f: jnp.einsum(
            "kvc,kcd->vd", gather_by_rank(f, hash_[1], ranks), w
        ),
        feats,
    )
    try:
        t_pl = timed(
            "pallas fused",
            lambda f: subm_conv_pallas(f, ranks, w),
            f_sorted,
        )
        print(f"fused speedup: {t_xla / t_pl:.2f}x")
    except Exception as e:
        print(f"pallas fused failed to compile/run: {e!r}")


if __name__ == "__main__":
    main()
