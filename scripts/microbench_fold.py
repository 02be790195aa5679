#!/usr/bin/env python
"""Forward-time comparison: GroupNorm vs BatchNorm-eval vs FOLDED conv+bias
on the flagship UNet (VERDICT r1 #6 'measured fwd-time drop').

Methodology matches bench.py: on-device fori_loop, perturbed inputs, two
loop lengths differenced (cancels tunnel dispatch overhead).

Usage: python scripts/microbench_fold.py [model] [batch] [hw] [iters]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.models import build_model
from lyft3d_tpu.models.fold_bn import fold_batch_norms

MODEL = sys.argv[1] if len(sys.argv) > 1 else "unet_seresnext101"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
HW = int(sys.argv[3]) if len(sys.argv) > 3 else 336
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 8


def timed(name, model, variables, x):
    def rep(variables, x, iters):
        def body(i, acc):
            logits, aux = model.apply(
                variables, x + i.astype(x.dtype) * 1e-6
            )
            return acc + jnp.sum(jnp.abs(logits).astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(2,))
    float(f(variables, x, 1))
    float(f(variables, x, 1 + ITERS))

    def once(iters):
        t0 = time.perf_counter()
        float(f(variables, x, iters))
        return time.perf_counter() - t0

    ts = min(once(1) for _ in range(2))
    tl = min(once(1 + ITERS) for _ in range(2))
    ms = (tl - ts) / ITERS * 1000
    print(f"{name}: {ms:.2f} ms fwd (batch {B}, {HW}x{HW})", flush=True)
    return ms


def main():
    x = jnp.asarray(
        np.random.RandomState(0).rand(B, HW, HW, 6).astype(np.float32)
    )

    gn = build_model(MODEL, n_classes=10, dtype=jnp.bfloat16)
    gn_vars = jax.jit(gn.init)(jax.random.PRNGKey(0), x[:1])
    t_gn = timed("groupnorm", gn, gn_vars, x)

    bn = build_model(MODEL, n_classes=10, norm_type="batch", dtype=jnp.bfloat16)
    bn_vars = jax.jit(bn.init)(jax.random.PRNGKey(0), x[:1])
    t_bn = timed("batchnorm-eval", bn, bn_vars, x)

    folded = build_model(MODEL, n_classes=10, norm_type="folded",
                         dtype=jnp.bfloat16)
    folded_vars = fold_batch_norms(jax.tree_util.tree_map(np.asarray, bn_vars))
    t_fold = timed("folded", folded, folded_vars, x)

    print(
        f"fold speedup vs groupnorm: {t_gn / t_fold:.2f}x; "
        f"vs batchnorm-eval: {t_bn / t_fold:.2f}x"
    )


if __name__ == "__main__":
    main()
