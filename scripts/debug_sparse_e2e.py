#!/usr/bin/env python
"""Reproduce bench.py's sparse-FHD e2e section standalone: time it, then
walk the unit middle stage by stage and print each stencil call's window
COVERAGE flag — a False means that call silently runs the exact XLA gather
reference for the whole batch (the lax.cond fallback, ~10x slower at FHD).

Usage: python scripts/debug_sparse_e2e.py [batch] [iters]
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
from lyft3d_tpu.models.second.voxelnet import VoxelNet, voxelnet_predict
from lyft3d_tpu.ops.voxelize import voxelize
from lyft3d_tpu.pipelines.second_train import voxelnet_config_from_experiment

REPO = Path(__file__).resolve().parent.parent
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N = 262144


def main():
    exp = load_yaml(
        SecondExperiment, REPO / "configs" / "second_lyft_9class_sparse.yaml"
    )
    cfg = voxelnet_config_from_experiment(exp)
    cfg = dataclasses.replace(cfg, middle_norm="folded")
    net = VoxelNet(cfg)
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
    vox0 = jax.eval_shape(
        jax.vmap(
            lambda p, v: voxelize(p, v, cfg.grid, cfg.max_voxels,
                                  cfg.max_points_per_voxel)
        ),
        pts[:1], valid[:1],
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            net.init, jax.random.PRNGKey(0), vox0["voxels"],
            vox0["num_points"], vox0["coords"], vox0["voxel_valid"],
        ),
    )
    anchors, _, _, acls = cfg.make_anchors()

    def e2e(params, points, valid):
        vox = jax.vmap(
            lambda p, v: voxelize(p, v, cfg.grid, cfg.max_voxels,
                                  cfg.max_points_per_voxel)
        )(points, valid)
        preds = net.apply(
            params, vox["voxels"], vox["num_points"], vox["coords"],
            vox["voxel_valid"],
        )
        det = jax.vmap(
            lambda b, c, d: voxelnet_predict(
                {"box": b, "cls": c, "dir": d}, anchors, acls, cfg
            )
        )(preds["box"], preds["cls"], preds["dir"])
        return det["boxes"], det["scores"]

    f = jax.jit(e2e)
    t0 = time.time()
    boxes, scores = jax.block_until_ready(f(params, pts, valid))
    print(f"compile+run: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(ITERS):
        boxes, scores = jax.block_until_ready(
            f(params, pts + i * 1e-6, valid)
        )
    dt = (time.time() - t0) / ITERS
    print(f"e2e: {dt * 1000:.1f} ms/batch-{B} "
          f"({B / dt:.2f} samples/s)", flush=True)

    # ---- stage-by-stage coverage walk (pure id arithmetic) ----
    from lyft3d_tpu.models.second.middle import (
        StridedUnitLayer,
        SubMUnitLayer,
    )
    from lyft3d_tpu.models.second.voxel_encoder import SimpleVoxel
    from lyft3d_tpu.ops.column_sparse import (
        stencil_coverage_ok,
        unit_qids_subm,
        units_from_voxels,
    )
    from lyft3d_tpu.ops.sparse_conv import ActiveSet

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
    cols, x = jax.jit(
        lambda f, a: jax.vmap(
            lambda ff, aa: units_from_voxels(ff, aa, zsl, True)
        )(f, a)
    )(feats, active)
    print(f"stage0 in: {x.shape} max-active "
          f"{int(cols.valid.sum(-1).max())}", flush=True)
    key = jax.random.PRNGKey(0)
    for si, (f, mo) in enumerate(
        zip(cfg.middle_features, cfg.middle_max_voxels)
    ):
        for li in range(2):
            zs, cin = x.shape[2], x.shape[3]
            kzp = -(-((zs + 2) * cin) // 128) * 128
            tt, ww = (512, 640) if kzp <= 256 else (256, 384)
            qids = jax.vmap(lambda cc: unit_qids_subm(cc, ncs))(cols)
            ok = jax.jit(
                lambda i, q: stencil_coverage_ok(i, q, i.shape[1], tt, ww)
            )(cols.col_ids, qids)
            print(f"stage{si} subm{li}: coverage ok per batch = "
                  f"{np.asarray(ok)}", flush=True)
            layer = SubMUnitLayer(f, ncs=ncs, dtype=jnp.bfloat16)
            lp = layer.init(key, x, cols)
            x = jax.jit(lambda xx, cc, pp=lp, ll=layer: ll.apply(pp, xx, cc))(
                x, cols
            )
        slayer = StridedUnitLayer(f, ncs=ncs, max_out=mo, dtype=jnp.bfloat16)
        sp = slayer.init(key, x, cols)
        # strided coverage: forward queries over the downsampled set
        from lyft3d_tpu.ops.column_sparse import downsample_units

        out_cols = jax.jit(
            lambda c: jax.vmap(lambda cc: downsample_units(cc, ncs, mo))(c)
        )(cols)
        nxv, ny = (int(cols.bev_shape[0]), int(cols.bev_shape[1]))
        # replicate strided qids via the layer's own path: run coverage on
        # the forward stencil geometry
        from lyft3d_tpu.ops.column_sparse import _bev_offsets2d

        def strided_qids(oc_ids, oc_valid, onxv, nx_, ny_):
            offs = _bev_offsets2d()
            vx = oc_ids % onxv
            ox = vx // ncs
            slab = vx - ox * ncs
            oy = oc_ids // onxv
            qx = ox[None, :] * 2 + offs[:, None, 0]
            qy = oy[None, :] * 2 + offs[:, None, 1]
            inb = (oc_valid[None, :] & (qx >= 0) & (qx < nx_)
                   & (qy >= 0) & (qy < ny_))
            return jnp.where(inb, (qy * nx_ + qx) * ncs + slab[None, :], -1)

        onxv = int(out_cols.bev_shape[0])
        nx_ = nxv // ncs
        qids = jax.vmap(
            lambda i, v: strided_qids(i, v, onxv, nx_, ny)
        )(out_cols.col_ids, out_cols.valid)
        ok = jax.jit(
            lambda i, q: stencil_coverage_ok(i, q, i.shape[1], 256, 768)
        )(cols.col_ids, qids)
        print(f"stage{si} strided: coverage ok per batch = "
              f"{np.asarray(ok)}", flush=True)
        x, cols = jax.jit(
            lambda xx, cc, pp=sp, ll=slayer: ll.apply(pp, xx, cc)
        )(x, cols)
        print(f"stage{si} out: {x.shape} max-active "
              f"{int(cols.valid.sum(-1).max())}", flush=True)


if __name__ == "__main__":
    main()
