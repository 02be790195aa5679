#!/usr/bin/env python
"""A/B voxelize formulations at FHD scale (262k pts, 60k voxels, mppv=1).

Variants:
  current   — one 2+D-operand sort carries the whole point payload
  gather    — 2-operand (key, idx) sort; payload rows gathered at the 60k
              surviving voxel starts only (points[orig_idx[starts]])
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
from lyft3d_tpu.ops.voxelize import voxelize
from lyft3d_tpu.pipelines.second_train import voxelnet_config_from_experiment

REPO = Path(__file__).resolve().parent.parent
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = 8
N = 262144


def timed(name, fn, *args):
    def rep(args, iters):
        def body(i, acc):
            p = args[0] + i.astype(args[0].dtype) * 1e-6
            out = fn(p, *args[1:])
            return acc + jax.tree_util.tree_reduce(
                lambda s, a: s + jnp.sum(jnp.abs(a).astype(jnp.float32)),
                out,
                0.0,
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
    print(f"{name:30s}: {(tl - ts) / ITERS * 1000:8.2f} ms (batch {B})",
          flush=True)


def main():
    exp = load_yaml(
        SecondExperiment, REPO / "configs" / "second_lyft_9class_sparse.yaml"
    )
    vcfg = voxelnet_config_from_experiment(exp)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.stack(
            [
                np.column_stack(
                    [
                        rng.uniform(-49.6, 49.6, N),
                        rng.uniform(-49.6, 49.6, N),
                        rng.uniform(-3.0, 1.0, N),
                        rng.uniform(0, 1, N),
                    ]
                ).astype(np.float32)
                for _ in range(B)
            ]
        )
    )
    valid = jnp.ones((B, N), bool)

    timed(
        "voxelize current",
        lambda p, v: jax.vmap(
            lambda pp, vv: voxelize(pp, vv, vcfg.grid, vcfg.max_voxels,
                                    vcfg.max_points_per_voxel)
        )(p, v),
        pts, valid,
    )


def breakdown():
    """Piecewise costs: block filter, key sort, compaction sort, windows."""
    exp = load_yaml(
        SecondExperiment, REPO / "configs" / "second_lyft_9class_sparse.yaml"
    )
    vcfg = voxelnet_config_from_experiment(exp)
    g = vcfg.grid
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.column_stack([
            rng.uniform(-49.6, 49.6, N),
            rng.uniform(-49.6, 49.6, N),
            rng.uniform(-3.0, 1.0, N),
            rng.uniform(0, 1, N),
        ]).astype(np.float32)
    )
    pts = jnp.broadcast_to(pts, (B, N, 4)) + jnp.arange(B)[:, None, None] * 1e-5
    valid = jnp.ones((B, N), bool)

    from lyft3d_tpu.ops.voxelize import block_filter_mask

    timed("block_filter_mask", lambda p, v: jax.vmap(
        lambda pp, vv: block_filter_mask(pp, vv, g))(p, v), pts, valid)

    def keysort2(p, v):
        nx, ny, nz = g.grid_size
        r = g.point_cloud_range
        vs = g.voxel_size
        ix = jnp.floor((p[..., 0] - r[0]) / vs[0]).astype(jnp.int32)
        iy = jnp.floor((p[..., 1] - r[1]) / vs[1]).astype(jnp.int32)
        iz = jnp.floor((p[..., 2] - r[2]) / vs[2]).astype(jnp.int32)
        flat = (iy * nx + ix) * nz + iz
        ar = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), flat.shape)
        return jax.vmap(
            lambda f, a: jax.lax.sort((f, a), dimension=0, num_keys=1,
                                      is_stable=False)
        )(flat, ar)

    timed("keysort 2-operand", keysort2, pts, valid)

    def full_vox(p, v):
        return jax.vmap(
            lambda pp, vv: voxelize(pp, vv, g, vcfg.max_voxels,
                                    vcfg.max_points_per_voxel)
        )(p, v)

    timed("voxelize full", full_vox, pts, valid)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "breakdown":
        breakdown()
    else:
        main()
