#!/usr/bin/env python
"""Full TRAIN-STEP timing for the sparse-FHD voxelnet config.

Measures one optimizer step — voxelize → target assign → VoxelNet with the
column-sparse middle (forward AND the fused reverse-stencil backward) →
focal+smooth-L1 loss → grads → adam update — at the reference FHD geometry
(second_lyft_9class_sparse.yaml), bench methodology (on-device fori_loop,
perturbed points, differenced loop lengths).

Usage: python scripts/microbench_sparse_train.py [batch] [iters]
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
import optax

from lyft3d_tpu.config import SecondExperiment, load_yaml
from lyft3d_tpu.models.second.voxelnet import VoxelNet
from lyft3d_tpu.ops.voxelize import voxelize
from lyft3d_tpu.pipelines.second_train import (
    make_second_loss_fn,
    voxelnet_config_from_experiment,
)

REPO = Path(__file__).resolve().parent.parent
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N = 262144
N_GT = 32


def main():
    exp = load_yaml(
        SecondExperiment, REPO / "configs" / "second_lyft_9class_sparse.yaml"
    )
    vcfg = voxelnet_config_from_experiment(exp)
    model = VoxelNet(vcfg)
    loss_fn = make_second_loss_fn(vcfg)

    rng = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(
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
        ),
        "points_valid": jnp.ones((B, N), bool),
        "gt_boxes": jnp.asarray(
            np.stack(
                [
                    np.column_stack(
                        [
                            rng.uniform(-40, 40, N_GT),
                            rng.uniform(-40, 40, N_GT),
                            rng.uniform(-1.5, 0.0, N_GT),
                            rng.uniform(1.5, 3.0, N_GT),
                            rng.uniform(3.0, 10.0, N_GT),
                            rng.uniform(1.4, 3.0, N_GT),
                            rng.uniform(-3.14, 3.14, N_GT),
                        ]
                    ).astype(np.float32)
                    for _ in range(B)
                ]
            )
        ),
        "gt_classes": jnp.asarray(
            rng.randint(0, len(exp.anchors), (B, N_GT)).astype(np.int32)
        ),
        "gt_valid": jnp.ones((B, N_GT), bool),
    }

    vox0 = jax.eval_shape(
        jax.vmap(
            lambda p, v: voxelize(p, v, vcfg.grid, vcfg.max_voxels,
                                  vcfg.max_points_per_voxel)
        ),
        batch["points"][:1], batch["points_valid"][:1],
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            model.init, jax.random.PRNGKey(0), vox0["voxels"],
            vox0["num_points"], vox0["coords"], vox0["voxel_valid"],
        ),
    )
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    def train_step(params, opt_state, batch, key):
        def lf(p):
            return loss_fn(model, p, batch, key)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def repeated(params, opt_state, batch, iters):
        def body(i, carry):
            p, o, acc = carry
            b = dict(batch)
            b["points"] = batch["points"] + i.astype(jnp.float32) * 1e-6
            p, o, loss = train_step(p, o, b, jax.random.PRNGKey(0))
            return p, o, acc + loss

        _, _, acc = jax.lax.fori_loop(
            0, iters, body, (params, opt_state, jnp.float32(0))
        )
        return acc

    f = jax.jit(repeated, static_argnums=(3,))
    t0 = time.perf_counter()
    float(f(params, opt_state, batch, 1))
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)
    float(f(params, opt_state, batch, 1 + ITERS))

    def once(iters):
        t0 = time.perf_counter()
        float(f(params, opt_state, batch, iters))
        return time.perf_counter() - t0

    ts = min(once(1) for _ in range(2))
    tl = min(once(1 + ITERS) for _ in range(2))
    ms = (tl - ts) / ITERS * 1000
    print(
        f"sparse-FHD train step: {ms:.1f} ms/step (batch {B}) = "
        f"{B / ms * 1000:.2f} samples/s "
        f"[fwd+fused-reverse-stencil-bwd+adam, {jax.default_backend()}]",
        flush=True,
    )


if __name__ == "__main__":
    main()
