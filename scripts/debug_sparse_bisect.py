#!/usr/bin/env python
"""Bisect the sparse-FHD e2e slowdown: time each pipeline section as its
own jit, then progressively larger fused programs, to find where the
whole-program jit loses ~7x vs the per-layer component sum.

Usage: python scripts/debug_sparse_bisect.py [batch] [iters]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lyft3d_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.config import SecondExperiment, load_yaml
from lyft3d_tpu.models.second.middle import SparseMiddleUnits
from lyft3d_tpu.models.second.voxel_encoder import SimpleVoxel
from lyft3d_tpu.models.second.voxelnet import VoxelNet, voxelnet_predict
from lyft3d_tpu.ops.sparse_conv import ActiveSet
from lyft3d_tpu.ops.voxelize import voxelize
from lyft3d_tpu.pipelines.second_train import voxelnet_config_from_experiment

REPO = Path(__file__).resolve().parent.parent
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N = 262144


def timed(name, f, *args):
    f = jax.jit(f)
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(ITERS):
        out = jax.block_until_ready(f(*args))
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:40s}: {dt:8.1f} ms", flush=True)
    return out


def main():
    exp = load_yaml(
        SecondExperiment, REPO / "configs" / "second_lyft_9class_sparse.yaml"
    )
    cfg = voxelnet_config_from_experiment(exp)
    cfg = dataclasses.replace(cfg, middle_norm="folded")
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

    vox = timed(
        "voxelize",
        lambda p, v: jax.vmap(
            lambda pp, vv: voxelize(pp, vv, cfg.grid, cfg.max_voxels,
                                    cfg.max_points_per_voxel)
        )(p, v),
        pts, valid,
    )

    enc = SimpleVoxel(num_features=vox["voxels"].shape[-1],
                      dtype=jnp.bfloat16)
    ep = enc.init(jax.random.PRNGKey(0), vox["voxels"][:1],
                  vox["num_points"][:1], vox["coords"][:1])
    feats = timed(
        "encoder",
        lambda v, n, c: enc.apply(ep, v, n, c),
        vox["voxels"], vox["num_points"], vox["coords"],
    )
    active = jax.vmap(
        lambda c, v: ActiveSet(coords=c, valid=v,
                               spatial_shape=cfg.grid.grid_size)
    )(vox["coords"], vox["voxel_valid"])

    mid = SparseMiddleUnits(
        stage_features=cfg.middle_features,
        stage_max_voxels=cfg.middle_max_voxels,
        z_slab=cfg.middle_z_slab,
        dtype=jnp.bfloat16,
        norm_type=cfg.middle_norm,
        assume_sorted_voxels=True,
    )
    mp = jax.jit(mid.init)(jax.random.PRNGKey(0), feats, active)
    bev = timed(
        "middle (ONE jit, whole stack)",
        lambda f, a: mid.apply(mp, f, a)[0],
        feats, active,
    )

    from lyft3d_tpu.models.second.rpn import RPN

    rpn = RPN(
        layer_nums=cfg.rpn_layer_nums,
        layer_strides=cfg.rpn_strides,
        num_filters=cfg.rpn_filters,
        upsample_strides=cfg.rpn_up_strides,
        num_upsample_filters=cfg.rpn_up_filters,
        num_anchors_per_loc=cfg.anchors_per_loc,
        num_classes=cfg.num_classes,
        box_code_size=cfg.box_code_size,
        dtype=jnp.bfloat16,
    )
    rp = jax.jit(rpn.init)(jax.random.PRNGKey(0), bev)
    preds = timed("rpn", lambda b: rpn.apply(rp, b), bev)

    anchors, _, _, acls = cfg.make_anchors()
    timed(
        "predict",
        lambda b, c, d: jax.vmap(
            lambda bb, cc, dd: voxelnet_predict(
                {"box": bb, "cls": cc, "dir": dd}, anchors, acls, cfg
            )
        )(b, c, d),
        preds["box"].reshape(B, -1, cfg.box_code_size).astype(jnp.float32),
        preds["cls"].reshape(B, -1, cfg.num_classes).astype(jnp.float32),
        preds["dir"].reshape(B, -1, 2).astype(jnp.float32),
    )

    # fused: encoder + middle in one jit
    timed(
        "encoder+middle (one jit)",
        lambda v, n, c, a: mid.apply(mp, enc.apply(ep, v, n, c), a)[0],
        vox["voxels"], vox["num_points"], vox["coords"], active,
    )

    # fused: voxelize + encoder + middle
    def vem(p, vv):
        vx = jax.vmap(
            lambda pp, v2: voxelize(pp, v2, cfg.grid, cfg.max_voxels,
                                    cfg.max_points_per_voxel)
        )(p, vv)
        f = enc.apply(ep, vx["voxels"], vx["num_points"], vx["coords"])
        a = jax.vmap(
            lambda c, v2: ActiveSet(coords=c, valid=v2,
                                    spatial_shape=cfg.grid.grid_size)
        )(vx["coords"], vx["voxel_valid"])
        return mid.apply(mp, f, a)[0]

    timed("voxelize+encoder+middle (one jit)", vem, pts, valid)


if __name__ == "__main__":
    main()
