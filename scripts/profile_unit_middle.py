#!/usr/bin/env python
"""Per-stage timing of the z-slab UNIT sparse middle at FHD geometry.

Times each phase of SparseMiddleUnits (units_from_voxels, per-stage subm
layers / strided layer, dense-BEV flatten) plus the surrounding e2e
sections (voxelize, RPN, predict), using the bench methodology (on-device
fori_loop, perturbed inputs, differenced loop lengths). Companion of
scripts/profile_column_middle.py for the column formulation.

Usage: python scripts/profile_unit_middle.py [batch] [iters] [z_slab]
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
    SubMUnitLayer,
    StridedUnitLayer,
)
from lyft3d_tpu.models.second.voxelnet import VoxelNet, voxelnet_predict
from lyft3d_tpu.ops.column_sparse import (
    units_from_voxels,
    units_to_dense_bev,
)
from lyft3d_tpu.ops.sparse_conv import ActiveSet
from lyft3d_tpu.ops.voxelize import voxelize
from lyft3d_tpu.pipelines.second_train import voxelnet_config_from_experiment

REPO = Path(__file__).resolve().parent.parent
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
Z_SLAB = int(sys.argv[3]) if len(sys.argv) > 3 else 8
N = 262144


def timed(name, fn, *args, perturb=True):
    """fn(*args) — first arg perturbed per on-device iteration."""

    def rep(args, iters):
        def body(i, acc):
            if perturb:
                a0 = jax.tree.map(
                    lambda a: a + i.astype(a.dtype) * 1e-6
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    args[0],
                )
            else:
                a0 = args[0]
            out = fn(a0, *args[1:])
            return acc + jax.tree_util.tree_reduce(
                lambda s, a: s
                + jnp.sum(jnp.abs(a).astype(jnp.float32))
                if jnp.issubdtype(a.dtype, jnp.floating) or jnp.issubdtype(a.dtype, jnp.integer)
                else s,
                out,
                0.0,
            )

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
    print(f"{name:42s}: {ms:8.2f} ms/iter (batch {B})", flush=True)
    return ms


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
                    ]
                ).astype(np.float32)
                for _ in range(B)
            ]
        )
    )
    valid = jnp.ones((B, N), bool)

    vox_fn = lambda p, v: jax.vmap(
        lambda pp, vv: voxelize(
            pp, vv, vcfg.grid, vcfg.max_voxels, vcfg.max_points_per_voxel
        )
    )(p, v)
    timed("voxelize", vox_fn, pts, valid)
    vox = jax.jit(vox_fn)(pts, valid)

    # simple encoder: mean of points per voxel
    from lyft3d_tpu.models.second.voxel_encoder import SimpleVoxel

    enc = SimpleVoxel(num_features=vox["voxels"].shape[-1], dtype=jnp.bfloat16)
    ep = enc.init(jax.random.PRNGKey(0), vox["voxels"][:1], vox["num_points"][:1],
                  vox["coords"][:1])
    feats = jax.jit(lambda v, n, c: enc.apply(ep, v, n, c))(
        vox["voxels"], vox["num_points"], vox["coords"]
    )

    active = jax.vmap(
        lambda c, v: ActiveSet(coords=c, valid=v, spatial_shape=vcfg.grid.grid_size)
    )(vox["coords"], vox["voxel_valid"])

    nz = vcfg.grid.grid_size[2]
    ncs = -(-nz // Z_SLAB)
    ufv = jax.jit(
        lambda f, a: jax.vmap(
            lambda ff, aa: units_from_voxels(ff, aa, Z_SLAB, True)
        )(f, a)
    )
    timed("units_from_voxels", ufv, feats, active)
    cols, x = ufv(feats, active)
    nact = int(jax.jit(lambda c: c.valid.sum(axis=-1).max())(cols))
    print(f"  -> units: colf {x.shape}, max active {nact}", flush=True)

    key = jax.random.PRNGKey(0)
    nz_cur = nz
    for si, (f, mo) in enumerate(
        zip(vcfg.middle_features, vcfg.middle_max_voxels)
    ):
        for li in range(2):
            layer = SubMUnitLayer(f, ncs=ncs, dtype=jnp.bfloat16)
            lp = layer.init(key, x, cols)
            sub_fn = jax.jit(
                lambda xx, cc, pp=lp, ll=layer: ll.apply(pp, xx, cc)
            )
            timed(f"stage{si} subm{li} C{x.shape[-1]}->{f}", sub_fn, x, cols)
            x = sub_fn(x, cols)
        slayer = StridedUnitLayer(f, ncs=ncs, max_out=mo, dtype=jnp.bfloat16)
        sp = slayer.init(key, x, cols)
        st_fn = jax.jit(
            lambda xx, cc, pp=sp, ll=slayer: ll.apply(pp, xx, cc)
        )
        timed(f"stage{si} strided C{x.shape[-1]}->{f} V->{mo}", st_fn, x, cols)
        x, cols = st_fn(x, cols)
        nz_cur = (nz_cur + 2 - 3) // 2 + 1
        nact = int(jax.jit(lambda c: c.valid.sum(axis=-1).max())(cols))
        print(f"  -> stage{si} out: colf {x.shape}, zs={x.shape[2]}, "
              f"nz={nz_cur}, max active {nact}", flush=True)

    dense_fn = jax.jit(
        lambda xx, cc: jax.vmap(
            lambda a, b: units_to_dense_bev(a, b, ncs, nz_cur)
        )(xx, cc)
    )
    timed("units_to_dense_bev", dense_fn, x, cols)
    bev = dense_fn(x, cols)
    print(f"  -> bev {bev.shape}", flush=True)

    # RPN + predict on the resulting BEV
    from lyft3d_tpu.models.second.rpn import RPN

    rpn = RPN(
        layer_nums=vcfg.rpn_layer_nums,
        layer_strides=vcfg.rpn_strides,
        num_filters=vcfg.rpn_filters,
        upsample_strides=vcfg.rpn_up_strides,
        num_upsample_filters=vcfg.rpn_up_filters,
        num_anchors_per_loc=vcfg.anchors_per_loc,
        num_classes=vcfg.num_classes,
        box_code_size=vcfg.box_code_size,
        dtype=jnp.bfloat16,
    )
    rp = jax.jit(rpn.init)(key, bev)
    rpn_fn = jax.jit(lambda b: rpn.apply(rp, b))
    timed("rpn", rpn_fn, bev)
    preds = rpn_fn(bev)

    anchors, _, _, acls = vcfg.make_anchors()

    def pred_fn(box, cls_, dir_):
        return jax.vmap(
            lambda bb, cc, dd: voxelnet_predict(
                {"box": bb, "cls": cc, "dir": dd}, anchors, acls, vcfg
            )
        )(box, cls_, dir_)

    timed("predict (decode+NMS)", pred_fn,
          preds["box"].reshape(B, -1, vcfg.box_code_size).astype(jnp.float32),
          preds["cls"].reshape(B, -1, vcfg.num_classes).astype(jnp.float32),
          preds["dir"].reshape(B, -1, 2).astype(jnp.float32))


if __name__ == "__main__":
    main()
