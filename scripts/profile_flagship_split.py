#!/usr/bin/env python
"""Batch-32 component split of the FLAGSHIP bench e2e (post round-2
fusions: folded-BN inference structure + fused logit-space extraction) —
the measurement VERDICT r2 asked for before spending the next ~10%.

Sections mirror bench.py's e2e exactly: raster+normalize+map-concat,
UNet forward (folded norm), extraction from logits, and the whole thing
as one jit. fori differencing with per-iteration float perturbation —
every section's ids derive from the perturbed floats, so nothing hoists.

Usage: python scripts/profile_flagship_split.py [batch] [iters]
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

from lyft3d_tpu.data.bev_pipeline import BEVConfig, normalize_bev
from lyft3d_tpu.models import build_model
from lyft3d_tpu.ops.bev_raster import bev_rasterize_matmul
from lyft3d_tpu.ops.mask_to_boxes import extract_detections_from_logits

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N = 65536


def timed(name, fn, x):
    def rep(x, iters):
        def body(i, acc):
            out = fn(x + i.astype(x.dtype) * 1e-6)
            return acc + jax.tree_util.tree_reduce(
                lambda s, a: s + jnp.sum(jnp.abs(a).astype(jnp.float32)),
                out, 0.0,
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(1,))
    float(f(x, 1))
    float(f(x, 1 + ITERS))

    def once(n):
        t0 = time.perf_counter()
        float(f(x, n))
        return time.perf_counter() - t0

    ts = min(once(1) for _ in range(2))
    tl = min(once(1 + ITERS) for _ in range(2))
    ms = (tl - ts) / ITERS * 1000
    print(f"{name:36s}: {ms:8.2f} ms/iter (batch {B})", flush=True)
    return ms


def main():
    cfg = BEVConfig()
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.stack(
            [
                np.column_stack(
                    [
                        rng.uniform(-60, 60, N),
                        rng.uniform(-60, 60, N),
                        rng.uniform(-2.5, 1.0, N),
                    ]
                ).astype(np.float32)
                for _ in range(B)
            ]
        )
    )
    valid = jnp.ones((B, N), bool)
    map_ch = jnp.asarray(rng.rand(B, *cfg.shape[:2]).astype(np.float32))

    def raster(p):
        lidar = jax.vmap(
            lambda q, v: normalize_bev(
                bev_rasterize_matmul(q, v, cfg.shape, cfg.voxel_size,
                                     cfg.z_offset)
            )
        )(p, valid)
        map3 = jnp.repeat(map_ch[..., None], 3, axis=-1)
        return jnp.concatenate([lidar, map3], axis=-1)

    t_raster = timed("raster+normalize+concat", raster, pts)

    model = build_model("unet_seresnext101", n_classes=10,
                        norm_type="folded", dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, *cfg.shape[:2], 6), jnp.float32)
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(model.init, jax.random.PRNGKey(0), x0),
    )
    x_in = raster(pts)
    t_fwd = timed("unet fwd (folded)",
                  lambda xx: model.apply(params, xx)[0], x_in)

    logits = jnp.asarray(
        rng.randn(B, *cfg.shape[:2], 10).astype(np.float32)
    )
    t_ex = timed(
        "extraction (from logits)",
        lambda lg: jax.vmap(
            lambda q: extract_detections_from_logits(
                q, max_components=64, max_pixels=512
            )
        )(lg)["boxes_px"],
        logits,
    )

    def e2e(p):
        x = raster(p)
        lg, _ = model.apply(params, x)
        det = jax.vmap(
            lambda q: extract_detections_from_logits(
                q, max_components=64, max_pixels=512
            )
        )(lg)
        return det["boxes_px"], det["scores"]

    t_all = timed("e2e ONE jit", e2e, pts)
    print(f"{'SECTION SUM':36s}: {t_raster + t_fwd + t_ex:8.2f} ms")
    print(f"sweeps/s at batch {B}: {B / t_all * 1000:.1f}")


if __name__ == "__main__":
    main()
