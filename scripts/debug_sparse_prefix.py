#!/usr/bin/env python
"""Incremental-prefix timing of the unit middle: jit progressively longer
prefixes of the layer chain and print the per-prefix delta, to find where
the one-program jit loses vs the per-layer sum.

Usage: python scripts/debug_sparse_prefix.py [batch] [iters]
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


def timed_fori(name, fn, args, iters):
    """bench methodology: on-device fori_loop, perturbed floats,
    differenced loop lengths."""

    def rep(args, n):
        def body(i, acc):
            a0 = jax.tree.map(
                lambda a: a + i.astype(a.dtype) * 1e-6
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                args[0],
            )
            out = fn(a0, *args[1:])
            return acc + jax.tree_util.tree_reduce(
                lambda s, a: s + jnp.sum(jnp.abs(a).astype(jnp.float32))
                if jnp.issubdtype(a.dtype, jnp.floating) else s,
                out, 0.0,
            )

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(1,))
    float(f(args, 1))
    float(f(args, 1 + iters))

    def once(n):
        t0 = time.perf_counter()
        float(f(args, n))
        return time.perf_counter() - t0

    ts = min(once(1) for _ in range(2))
    tl = min(once(1 + iters) for _ in range(2))
    return (tl - ts) / iters * 1000


def main():
    exp = load_yaml(
        SecondExperiment, REPO / "configs" / "second_lyft_9class_sparse.yaml"
    )
    cfg = voxelnet_config_from_experiment(exp)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.stack(
            [
                np.column_stack(
                    [
                        rng.uniform(-49.6, 49.6, N),
                        rng.uniform(-49.6, 49.6, N),
                        rng.uniform(-3.0, 1.0, N),
                    ]
                ).astype(np.float32)
                for _ in range(B)
            ]
        )
    )
    valid = jnp.ones((B, N), bool)
    vox = jax.jit(
        jax.vmap(
            lambda p, v: voxelize(p, v, cfg.grid, cfg.max_voxels,
                                  cfg.max_points_per_voxel)
        )
    )(pts, valid)
    enc = SimpleVoxel(num_features=vox["voxels"].shape[-1],
                      dtype=jnp.bfloat16)
    ep = enc.init(jax.random.PRNGKey(0), vox["voxels"][:1],
                  vox["num_points"][:1], vox["coords"][:1])
    feats = jax.jit(lambda v, n, c: enc.apply(ep, v, n, c))(
        vox["voxels"], vox["num_points"], vox["coords"]
    )
    active = jax.vmap(
        lambda c, v: ActiveSet(coords=c, valid=v,
                               spatial_shape=cfg.grid.grid_size)
    )(vox["coords"], vox["voxel_valid"])

    nz = cfg.grid.grid_size[2]
    zsl = cfg.middle_z_slab
    ncs = -(-nz // zsl)

    # Pre-init every layer's params against intermediate shapes.
    key = jax.random.PRNGKey(0)
    cols0, x0 = jax.jit(
        lambda f, a: jax.vmap(
            lambda ff, aa: units_from_voxels(ff, aa, zsl, True)
        )(f, a)
    )(feats, active)
    layers = []  # (kind, layer, params)
    x, cols = x0, cols0
    for si, (f, mo) in enumerate(
        zip(cfg.middle_features, cfg.middle_max_voxels)
    ):
        for li in range(2):
            l = SubMUnitLayer(f, ncs=ncs, dtype=jnp.bfloat16)
            p = l.init(key, x, cols)
            layers.append((f"s{si}.subm{li}", "subm", l, p))
            x = jax.jit(lambda xx, cc, pp=p, ll=l: ll.apply(pp, xx, cc))(
                x, cols
            )
        l = StridedUnitLayer(f, ncs=ncs, max_out=mo, dtype=jnp.bfloat16)
        p = l.init(key, x, cols)
        layers.append((f"s{si}.strided", "strided", l, p))
        x, cols = jax.jit(
            lambda xx, cc, pp=p, ll=l: ll.apply(pp, xx, cc)
        )(x, cols)

    def prefix_fn(k):
        def run(f, a):
            cols, x = jax.vmap(
                lambda ff, aa: units_from_voxels(ff, aa, zsl, True)
            )(f, a)
            for name, kind, l, p in layers[:k]:
                if kind == "subm":
                    x = l.apply(p, x, cols)
                else:
                    x, cols = l.apply(p, x, cols)
            return x

        return run

    prev = timed_fori("ufv", prefix_fn(0), (feats, active), ITERS)
    print(f"prefix 0 (ufv only)        : {prev:8.2f} ms", flush=True)
    for k in range(1, len(layers) + 1):
        ms = timed_fori(layers[k - 1][0], prefix_fn(k), (feats, active),
                        ITERS)
        print(f"prefix {k} (+{layers[k - 1][0]:11s}): {ms:8.2f} ms "
              f"(delta {ms - prev:+8.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
