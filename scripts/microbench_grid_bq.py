#!/usr/bin/env python
"""Grid-bucketed vs dense (S, N) SA neighbor search at Lyft capacities:
times the full PointRCNN RPN forward (batch 4, 16384 pts) both ways, and
the joint net end-to-end, bf16 folded-norm inference structure.

Usage: python scripts/microbench_grid_bq.py [batch]
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lyft3d_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.models.pointrcnn.net import (
    PointRCNN,
    PointRCNN_RPN,
    lyft_pointrcnn_config,
)

N = 16384
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def timed(name, fn, *args, iters=6):
    g = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda s, x: s + jnp.sum(jnp.abs(x).astype(jnp.float32)),
        fn(*a), 0.0))
    t0 = time.perf_counter()
    float(g(*args))
    tc = time.perf_counter() - t0
    ts = []
    for i in range(iters):
        # Perturb so the relay result cache cannot serve a repeat.
        a2 = tuple(
            x + np.float32(1e-6 * (i + 1))
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x
            for x in args
        )
        t0 = time.perf_counter()
        float(g(*a2))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s}: {np.median(ts) * 1000:8.2f} ms  (compile {tc:.0f}s)",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.stack([np.column_stack([
            rng.uniform(-40, 40, N),      # x lateral
            rng.uniform(-2, 0.5, N),      # y height (rect frame)
            rng.uniform(0, 90, N),        # z forward
        ]).astype(np.float32) for _ in range(B)])
    )
    valid = jnp.ones((B, N), bool)
    print(f"device: {jax.devices()[0]} batch={B}", flush=True)

    base = lyft_pointrcnn_config("test")
    for name, cfg in [
        ("dense (S,N) + approx_min_k", dataclasses.replace(
            base, grid_bounds=None)),
        ("grid-bucketed 3x3", base),
    ]:
        rpn = PointRCNN_RPN(cfg, dtype=jnp.bfloat16, norm="folded")
        p = jax.jit(rpn.init)(
            jax.random.PRNGKey(0), pts[0], jnp.zeros((N, 1)), valid[0]
        )
        timed(f"RPN fwd  [{name}]",
              jax.vmap(lambda pp, vv: rpn.apply(
                  p, pp, jnp.zeros((N, 1), pp.dtype), vv)),
              pts, valid)
        model = PointRCNN(cfg, dtype=jnp.bfloat16, norm="folded")
        jp = jax.jit(model.init)(jax.random.PRNGKey(0), pts[0], None,
                                 valid[0])
        timed(f"joint e2e [{name}]",
              jax.vmap(lambda pp, vv: model.apply(jp, pp, None, vv)),
              pts, valid)


if __name__ == "__main__":
    main()
