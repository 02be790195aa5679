#!/usr/bin/env python
"""Per-component timing of the SECOND/voxelnet e2e path (bench methodology:
on-device fori_loop, perturbed inputs, two loop lengths differenced)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.config import SecondExperiment, load_yaml
from lyft3d_tpu.models.second.voxelnet import VoxelNet, voxelnet_predict
from lyft3d_tpu.ops.voxelize import voxelize
from lyft3d_tpu.pipelines.second_train import voxelnet_config_from_experiment

REPO = Path(__file__).resolve().parent.parent
# argv: [config_name] [batch] [n_points] [iters]
CONFIG = sys.argv[1] if len(sys.argv) > 1 else "second_lyft_9class.yaml"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N = int(sys.argv[3]) if len(sys.argv) > 3 else 262144
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 8


def timed(name, fn, *args):
    """fn(x, *rest) where x is perturbable float array."""

    def rep(args, iters):
        def body(i, acc):
            out = fn(args[0] + i.astype(args[0].dtype) * 1e-6, *args[1:])
            return acc + jax.tree_util.tree_reduce(
                lambda s, a: s + jnp.sum(jnp.abs(a).astype(jnp.float32)), out, 0.0
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(1,))
    float(f(args, 1))
    float(f(args, 1 + ITERS))
    t0 = time.perf_counter()
    float(f(args, 1))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(args, 1 + ITERS))
    tb = time.perf_counter() - t0
    print(f"{name}: {(tb - ta) / ITERS * 1000:.2f} ms/iter (batch {B})", flush=True)


def main():
    exp = load_yaml(SecondExperiment, REPO / "configs" / CONFIG)
    vcfg = voxelnet_config_from_experiment(exp)
    vnet = VoxelNet(vcfg)
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
        lambda pp, vv: voxelize(pp, vv, vcfg.grid, vcfg.max_voxels, vcfg.max_points_per_voxel)
    )(p, v)
    timed("voxelize", vox_fn, pts, valid)

    vox = jax.jit(vox_fn)(pts, valid)
    vparams = jax.jit(vnet.init)(
        jax.random.PRNGKey(0),
        vox["voxels"][:1], vox["num_points"][:1], vox["coords"][:1], vox["voxel_valid"][:1],
    )

    def net_fn(voxels, num_points, coords, vvalid):
        return vnet.apply(vparams, voxels, num_points, coords, vvalid)

    timed("net (encode+scatter+rpn)", net_fn,
          vox["voxels"], vox["num_points"], vox["coords"], vox["voxel_valid"])

    preds = jax.jit(net_fn)(vox["voxels"], vox["num_points"], vox["coords"], vox["voxel_valid"])
    anchors, _, _, acls = vcfg.make_anchors()

    def pred_fn(box, cls_, dir_):
        return jax.vmap(
            lambda b, c, d: voxelnet_predict({"box": b, "cls": c, "dir": d}, anchors, acls, vcfg)
        )(box, cls_, dir_)

    timed("predict (decode+NMS)", pred_fn, preds["box"], preds["cls"], preds["dir"])


if __name__ == "__main__":
    main()
