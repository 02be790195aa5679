#!/usr/bin/env python
"""HONEST prefix bisect inside units_from_voxels at FHD batch-4.

Two full input variants; the fori body picks variant i % 2 so nothing
hoists (see profile_sparse_honest.py). Prefixes replicate ufv's stages;
per-prefix deltas localize the cost.

Prefixes mirror the CURRENT formulation (inverse-permutation placement +
scatter-based positional ghost merge). History: the original per-unit
window formulation (vmap(dynamic_slice) + one-hot einsum) measured
+995 ms at FHD batch-4 here, motivating the inverse permutation; the
pair-sort ghost merge measured ~20 ms, motivating the positional merge.

Usage: python scripts/profile_ufv_parts.py [batch] [iters]
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

from lyft3d_tpu.ops import column_sparse as cs
from lyft3d_tpu.ops.sparse_conv import ActiveSet

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
V = 60000
NX = NY = 1984
NZ = 40
ZS = 8
NCS = NZ // ZS
C = 3


def make(seed):
    r = np.random.RandomState(seed)
    feats, coords = [], []
    for _ in range(B):
        xy = r.randint(0, NX, size=(V, 2)).astype(np.int32)
        z = r.randint(0, NZ, size=(V,)).astype(np.int32)
        cc = np.column_stack([xy[:, 0], xy[:, 1], z])
        key = (cc[:, 1].astype(np.int64) * NX + cc[:, 0]) * NZ + cc[:, 2]
        cc = cc[np.argsort(key, kind="stable")]
        coords.append(cc)
        feats.append(r.randn(V, C).astype(np.float32))
    active = ActiveSet(
        coords=jnp.asarray(np.stack(coords)),
        valid=jnp.ones((B, V), bool),
        spatial_shape=(NX, NY, NZ),
    )
    return jnp.asarray(np.stack(feats)), active


def timed(name, fn, args2, prev=0.0):
    def rep(a2, n):
        def body(i, acc):
            a = jax.tree.map(lambda x: x[i % 2], a2)
            out = fn(*a)
            return acc + jax.tree_util.tree_reduce(
                lambda s, x: s + jnp.sum(jnp.abs(x).astype(jnp.float32))
                if jnp.issubdtype(x.dtype, jnp.floating)
                or jnp.issubdtype(x.dtype, jnp.integer) else s,
                out, 0.0,
            )

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(1,))
    float(f(args2, 1))
    float(f(args2, 1 + ITERS))

    def once(n):
        t0 = time.perf_counter()
        float(f(args2, n))
        return time.perf_counter() - t0

    ts = min(once(1) for _ in range(2))
    tl = min(once(1 + ITERS) for _ in range(2))
    ms = (tl - ts) / ITERS * 1000
    print(f"{name:40s}: {ms:8.2f} ms (delta {ms - prev:+8.2f})", flush=True)
    return ms


def prefix(stage: int):
    """Replicates units_from_voxels (assume_sorted) up to `stage`."""

    def one(features, coords, valid):
        big2 = NX * NY
        bigu = big2 * NCS
        v = V
        unit_cap = v + v // 4
        bev = coords[:, 1] * NX + coords[:, 0]
        key = jnp.where(valid, bev * NZ + coords[:, 2], jnp.int32(big2 * NZ))
        skey, f_s = key, features
        valid_s = skey < big2 * NZ
        z_s = skey % NZ
        uid_s = jnp.where(valid_s, (skey // NZ) * NCS + z_s // ZS,
                          jnp.int32(bigu))
        zl_s = z_s - (z_s // ZS) * ZS
        if stage == 0:
            return uid_s, zl_s
        head = jnp.concatenate(
            [jnp.ones((1,), bool), uid_s[1:] != uid_s[:-1]]
        ) & valid_s
        urank = jnp.cumsum(head.astype(jnp.int32)) - 1
        arange_v = jnp.arange(v, dtype=jnp.int32)
        target = jnp.where(head, urank, v)
        if stage == 1:
            return target, urank
        unit_ids = jnp.full((v,), bigu, jnp.int32).at[target].set(
            uid_s, mode="drop", unique_indices=True
        )
        if stage == 2:
            return (unit_ids,)
        # Boundary-occupancy bits (current ID-ONLY formulation).
        tail = jnp.concatenate(
            [uid_s[1:] != uid_s[:-1], jnp.ones((1,), bool)]
        ) & valid_s
        target_t = jnp.where(tail, urank, v)
        first_occ = jnp.zeros((v,), bool).at[target].set(
            zl_s == 0, mode="drop", unique_indices=True
        )
        last_occ = jnp.zeros((v,), bool).at[target_t].set(
            zl_s == ZS - 1, mode="drop", unique_indices=True
        )
        if stage == 3:
            return unit_ids, first_occ, last_occ
        unit_valid = unit_ids < bigu
        final_ids, final_valid, out_pos = cs._insert_ghosts(
            unit_ids, unit_valid, first_occ, last_occ, NCS, bigu, unit_cap
        )
        if stage == 4:
            return final_ids, out_pos
        # Direct row scatter into the final ghost-merged layout.
        row = out_pos[jnp.minimum(urank, v - 1)]
        dest = jnp.where(
            valid_s & (row < unit_cap), row * ZS + zl_s,
            jnp.int32(unit_cap * ZS),
        )
        f_out = (
            jnp.zeros((unit_cap * ZS, C), f_s.dtype)
            .at[dest].set(f_s, mode="drop", unique_indices=True)
            .reshape(unit_cap, ZS, C)
        )
        if stage == 5:
            return (f_out,)
        m_out = (
            jnp.zeros((unit_cap * ZS,), jnp.int32)
            .at[dest].set(1, mode="drop", unique_indices=True)
            .astype(bool)
            .reshape(unit_cap, ZS)
        )
        return f_out, m_out, final_ids, final_valid

    return lambda f, a: jax.vmap(
        lambda ff, cc, vv: one(ff, cc, vv)
    )(f, a.coords, a.valid)


def main():
    f0, a0 = make(0)
    f1, a1 = make(1)
    args2 = jax.tree.map(lambda x, y: jnp.stack([x, y]), (f0, a0), (f1, a1))
    names = [
        "0 key/uid arithmetic",
        "1 head+cumsum",
        "2 scatter unit_ids",
        "3 scatter occ bits (x2)",
        "4 _insert_ghosts (id-only)",
        "5 direct feature row scatter",
        "6 mask scatter (full ufv)",
    ]
    prev = 0.0
    for s, n in enumerate(names):
        prev = timed(n, prefix(s), args2, prev)
    # the real thing for cross-checking
    timed("units_from_voxels (real)",
          lambda f, a: jax.vmap(
              lambda ff, aa: cs.units_from_voxels(ff, aa, ZS, True)
          )(f, a), args2)


if __name__ == "__main__":
    main()
