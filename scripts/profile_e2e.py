#!/usr/bin/env python
"""Per-component timing of the flagship e2e path on the current device.

Uses on-device fori_loops with per-iteration input perturbation (defeats
loop-invariant hoisting) and differences two loop lengths (cancels tunnel
dispatch overhead) — the same methodology as bench.py.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.data.bev_pipeline import BEVConfig
from lyft3d_tpu.models import build_model
from lyft3d_tpu.ops.bev_raster import (
    bev_rasterize_matmul,
    bev_rasterize_scatter,
    bev_rasterize_sort,
)
from lyft3d_tpu.ops.mask_to_boxes import extract_detections

B, N = 8, 65536
ITERS = 8


def timed(name, fn, x):
    """fn maps a float array (perturbable) to some pytree."""

    def rep(x, iters):
        def body(i, acc):
            out = fn(x + i.astype(x.dtype) * 1e-6)
            return acc + jax.tree_util.tree_reduce(
                lambda s, a: s + jnp.sum(jnp.abs(a).astype(jnp.float32)), out, 0.0
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(1,))
    float(f(x, 1))
    float(f(x, 1 + ITERS))
    t0 = time.perf_counter()
    float(f(x, 1))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(x, 1 + ITERS))
    tb = time.perf_counter() - t0
    print(f"{name}: {(tb - ta) / ITERS * 1000:.2f} ms/iter (batch {B})", flush=True)


def main():
    cfg = BEVConfig()
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-60, 60, (B, N, 3)).astype(np.float32))
    valid = jnp.ones((B, N), bool)

    for name, fn in (
        ("raster_sort", bev_rasterize_sort),
        ("raster_matmul", bev_rasterize_matmul),
        ("raster_scatter", bev_rasterize_scatter),
    ):
        timed(
            f"{name} x{B}",
            lambda p, fn=fn: jax.vmap(
                lambda q: fn(q, valid[0], cfg.shape, cfg.voxel_size, cfg.z_offset)
            )(p),
            pts,
        )

    model = build_model("unet_seresnext101", n_classes=10, dtype=jnp.bfloat16)
    x0 = jnp.asarray(rng.rand(B, 336, 336, 6).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 336, 336, 6)))
    timed("unet_seresnext101 fwd", lambda xx: model.apply(params, xx)[0], x0)

    probs = jnp.asarray(rng.rand(B, 336, 336, 10).astype(np.float32))
    probs = probs / probs.sum(-1, keepdims=True)
    timed(
        "extract_detections",
        lambda pr: jax.vmap(
            lambda q: extract_detections(q, max_components=64, max_pixels=512)
        )(pr)["boxes_px"],
        probs,
    )


if __name__ == "__main__":
    main()
