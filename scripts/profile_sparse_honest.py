#!/usr/bin/env python
"""HONEST per-section timing of the sparse-FHD unit-middle e2e.

Earlier per-layer timings perturbed only FLOAT inputs inside a fori_loop,
so XLA's loop-invariant code motion hoisted every id-dependent piece
(sorts, query ids, window prep, downsample) out of the timed loop — the
layer numbers measured little more than the stencil matmuls and summed to
~130 ms while the honestly-measured whole program ran at ~1155 ms.

Here every section gets TWO full input variants (built from two different
point clouds) stacked on a leading axis; the fori body gathers variant
``i % 2`` first, so every downstream op depends on the loop index and
nothing hoists. Differenced loop lengths cancel dispatch overhead.

Usage: python scripts/profile_sparse_honest.py [batch] [iters]
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

from lyft3d_tpu.config import SecondExperiment, load_yaml
from lyft3d_tpu.models.second.middle import (
    SparseMiddleUnits,
    StridedUnitLayer,
    SubMUnitLayer,
)
from lyft3d_tpu.models.second.voxel_encoder import SimpleVoxel
from lyft3d_tpu.ops.column_sparse import units_from_voxels, units_to_dense_bev
from lyft3d_tpu.ops.sparse_conv import ActiveSet
from lyft3d_tpu.ops.voxelize import voxelize
from lyft3d_tpu.pipelines.second_train import voxelnet_config_from_experiment

REPO = Path(__file__).resolve().parent.parent
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N = 262144


def timed(name, fn, args2):
    """args2: pytree whose leaves have leading axis 2 (two variants)."""

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
    print(f"{name:44s}: {ms:8.2f} ms/iter (batch {B})", flush=True)
    return ms


def stack2(a, b):
    return jax.tree.map(lambda x, y: jnp.stack([x, y]), a, b)


def main():
    exp = load_yaml(
        SecondExperiment, REPO / "configs" / "second_lyft_9class_sparse.yaml"
    )
    cfg = voxelnet_config_from_experiment(exp)
    rng = np.random.RandomState(0)

    def make_pts(seed):
        r = np.random.RandomState(seed)
        return jnp.asarray(
            np.stack(
                [
                    np.column_stack(
                        [
                            r.uniform(-49.6, 49.6, N),
                            r.uniform(-49.6, 49.6, N),
                            r.uniform(-3.0, 1.0, N),
                        ]
                    ).astype(np.float32)
                    for _ in range(B)
                ]
            )
        )

    pts2 = jnp.stack([make_pts(0), make_pts(1)])
    valid = jnp.ones((B, N), bool)

    vox_fn = jax.jit(
        jax.vmap(
            lambda p, v: voxelize(p, v, cfg.grid, cfg.max_voxels,
                                  cfg.max_points_per_voxel)
        )
    )
    vox2 = [vox_fn(pts2[k], valid) for k in range(2)]

    enc = SimpleVoxel(num_features=vox2[0]["voxels"].shape[-1],
                      dtype=jnp.bfloat16)
    ep = enc.init(jax.random.PRNGKey(0), vox2[0]["voxels"][:1],
                  vox2[0]["num_points"][:1], vox2[0]["coords"][:1])
    enc_fn = jax.jit(lambda v, n, c: enc.apply(ep, v, n, c))
    feats2 = [enc_fn(v["voxels"], v["num_points"], v["coords"])
              for v in vox2]
    active2 = [
        jax.vmap(
            lambda c, v: ActiveSet(coords=c, valid=v,
                                   spatial_shape=cfg.grid.grid_size)
        )(vx["coords"], vx["voxel_valid"])
        for vx in vox2
    ]

    timed("voxelize", lambda p, v: vox_fn(p, v), stack2(
        (pts2[0], valid), (pts2[1], valid)))

    nz = cfg.grid.grid_size[2]
    zsl = cfg.middle_z_slab
    ncs = -(-nz // zsl)

    ufv_fn = jax.jit(
        lambda f, a: jax.vmap(
            lambda ff, aa: units_from_voxels(ff, aa, zsl, True)
        )(f, a)
    )
    timed("units_from_voxels", ufv_fn,
          stack2((feats2[0], active2[0]), (feats2[1], active2[1])))

    cx2 = [ufv_fn(feats2[k], active2[k]) for k in range(2)]

    key = jax.random.PRNGKey(0)
    x2 = [cx2[k][1] for k in range(2)]
    cols2 = [cx2[k][0] for k in range(2)]
    total = 0.0
    for si, (f, mo) in enumerate(
        zip(cfg.middle_features, cfg.middle_max_voxels)
    ):
        for li in range(2):
            l = SubMUnitLayer(f, ncs=ncs, dtype=jnp.bfloat16)
            p = l.init(key, x2[0], cols2[0])
            ap = jax.jit(lambda xx, cc, pp=p, ll=l: ll.apply(pp, xx, cc))
            total += timed(f"stage{si} subm{li}", ap,
                           stack2((x2[0], cols2[0]), (x2[1], cols2[1])))
            x2 = [ap(x2[k], cols2[k]) for k in range(2)]
        l = StridedUnitLayer(f, ncs=ncs, max_out=mo, dtype=jnp.bfloat16)
        p = l.init(key, x2[0], cols2[0])
        ap = jax.jit(lambda xx, cc, pp=p, ll=l: ll.apply(pp, xx, cc))
        total += timed(f"stage{si} strided", ap,
                       stack2((x2[0], cols2[0]), (x2[1], cols2[1])))
        out2 = [ap(x2[k], cols2[k]) for k in range(2)]
        x2 = [o[0] for o in out2]
        cols2 = [o[1] for o in out2]

    nz_f = nz
    for _ in cfg.middle_features:
        nz_f = (nz_f + 2 - 3) // 2 + 1
    bev_fn = jax.jit(
        lambda xx, cc: jax.vmap(
            lambda x, c: units_to_dense_bev(x, c, ncs, nz_f)
        )(xx, cc)
    )
    total += timed("units_to_dense_bev", bev_fn,
                   stack2((x2[0], cols2[0]), (x2[1], cols2[1])))
    print(f"{'LAYER SUM (honest)':44s}: {total:8.2f} ms", flush=True)

    # Whole middle as ONE jit, same honest methodology.
    mid = SparseMiddleUnits(
        stage_features=cfg.middle_features,
        stage_max_voxels=cfg.middle_max_voxels,
        z_slab=zsl, dtype=jnp.bfloat16, assume_sorted_voxels=True,
    )
    mp = jax.jit(mid.init)(key, feats2[0], active2[0])
    timed("middle ONE jit", lambda f, a: mid.apply(mp, f, a)[0],
          stack2((feats2[0], active2[0]), (feats2[1], active2[1])))


if __name__ == "__main__":
    main()
