#!/usr/bin/env python
"""End-to-end BEV detection throughput benchmark (one chip).

Measures the flagship pipeline — lidar points → Pallas/MXU BEV raster →
seresnext101-UNet (bfloat16) → softmax → on-device component extraction →
rotated boxes — in lidar sweeps/sec on the default JAX device, and prints
ONE JSON line:

    {"metric": ..., "value": N, "unit": "sweeps/s", "vs_baseline": N}

``vs_baseline`` compares against the reference's CPU single-sweep inference
path (BASELINE.md: ``unet_baseline/unet-inference.py`` falls back to CPU —
torch conv forward + numpy raster + cv2 contours). The baseline number is
measured on this host by ``scripts/measure_cpu_baseline.py`` (torch-CPU
equivalent of the same model + post-processing) and cached in
``CPU_BASELINE.json``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BATCH = 8
N_POINTS = 65536  # one Lyft sweep ≈ 62k points
WARMUP = 2
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lyft3d_tpu.data.bev_pipeline import BEVConfig
    from lyft3d_tpu.models import build_model
    from lyft3d_tpu.ops.bev_raster import bev_rasterize_matmul, normalize_bev
    from lyft3d_tpu.ops.mask_to_boxes import extract_detections

    cfg = BEVConfig()
    on_tpu = jax.default_backend() == "tpu"

    model = build_model("unet_seresnext101", n_classes=10, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, *cfg.shape[:2], 6), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    def e2e(params, points, valid, map_ch):
        def raster_one(p, v):
            return normalize_bev(
                bev_rasterize_matmul(p, v, cfg.shape, cfg.voxel_size, cfg.z_offset)
            )

        lidar = jax.vmap(raster_one)(points, valid)  # (B, H, W, 3)
        map3 = jnp.repeat(map_ch[..., None], 3, axis=-1)
        x = jnp.concatenate([lidar, map3], axis=-1)
        logits, _ = model.apply(params, x)
        probs = jax.nn.softmax(logits, axis=-1)
        det = jax.vmap(
            lambda pr: extract_detections(pr, max_components=64, max_pixels=512)
        )(probs)
        return det["boxes_px"], det["box_valid"], det["scores"], det["detect"]

    def repeated(params, points, valid, map_ch, iters):
        """Run the e2e pipeline ``iters`` times ON DEVICE, carrying a
        checksum. Points are perturbed per-iteration so XLA cannot hoist the
        loop body (the axon relay makes per-dispatch host timing unreliable:
        block_until_ready returns early and each dispatch pays tunnel
        latency — an on-device loop amortizes both)."""

        def body(i, acc):
            p = points + (i.astype(jnp.float32) * 1e-6)
            boxes, bvalid, scores, detect = e2e(params, p, valid, map_ch)
            return acc + jnp.sum(scores) + jnp.sum(boxes)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    repeated = jax.jit(repeated, static_argnums=(4,))

    rng = np.random.RandomState(0)
    points = jnp.asarray(
        np.stack(
            [
                np.column_stack(
                    [
                        rng.uniform(-60, 60, N_POINTS),
                        rng.uniform(-60, 60, N_POINTS),
                        rng.uniform(-2.5, 1.0, N_POINTS),
                    ]
                ).astype(np.float32)
                for _ in range(BATCH)
            ]
        )
    )
    valid = jnp.ones((BATCH, N_POINTS), bool)
    map_ch = jnp.asarray(rng.rand(BATCH, *cfg.shape[:2]).astype(np.float32))

    # Warmup / compile both loop lengths; fetch the scalar to force sync.
    float(repeated(params, points, valid, map_ch, 2))
    float(repeated(params, points, valid, map_ch, 2 + ITERS))

    def timed(iters):
        t0 = time.perf_counter()
        float(repeated(params, points, valid, map_ch, iters))
        return time.perf_counter() - t0

    # Difference of two loop lengths cancels the constant dispatch/transfer
    # overhead of the tunnel.
    t_short = min(timed(2) for _ in range(2))
    t_long = min(timed(2 + ITERS) for _ in range(2))
    dt = max(t_long - t_short, 1e-9)
    sweeps_per_sec = BATCH * ITERS / dt

    # Secondary: the TPU-optimal flagship variant. The reference's
    # seresnext101 uses cardinality-32 grouped convs whose 16-wide group
    # outputs cap MXU lane utilization at ~1/8 (measured: seresnext101
    # backbone 27.3 ms vs resnet50 2.0 ms at comparable FLOPs, batch 8);
    # resnet50-UNet is the dense-conv alternative this framework recommends
    # on TPU.
    model50 = build_model("unet_resnet50", n_classes=10, dtype=jnp.bfloat16)
    params50 = jax.jit(model50.init)(jax.random.PRNGKey(0), x0)

    def e2e50(params, points, valid, map_ch):
        def raster_one(p, v):
            return normalize_bev(
                bev_rasterize_matmul(p, v, cfg.shape, cfg.voxel_size, cfg.z_offset)
            )

        lidar = jax.vmap(raster_one)(points, valid)
        map3 = jnp.repeat(map_ch[..., None], 3, axis=-1)
        xx = jnp.concatenate([lidar, map3], axis=-1)
        logits, _ = model50.apply(params, xx)
        probs = jax.nn.softmax(logits, axis=-1)
        det = jax.vmap(
            lambda pr: extract_detections(pr, max_components=64, max_pixels=512)
        )(probs)
        return det["boxes_px"], det["box_valid"], det["scores"], det["detect"]

    def repeated50(params, points, valid, map_ch, iters):
        def body(i, acc):
            p = points + (i.astype(jnp.float32) * 1e-6)
            boxes, bvalid, scores, detect = e2e50(params, p, valid, map_ch)
            return acc + jnp.sum(scores) + jnp.sum(boxes)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    repeated50 = jax.jit(repeated50, static_argnums=(4,))
    float(repeated50(params50, points, valid, map_ch, 2))
    float(repeated50(params50, points, valid, map_ch, 2 + ITERS))

    def timed50(iters):
        t0 = time.perf_counter()
        float(repeated50(params50, points, valid, map_ch, iters))
        return time.perf_counter() - t0

    t_s50 = min(timed50(2) for _ in range(2))
    t_l50 = min(timed50(2 + ITERS) for _ in range(2))
    sweeps50 = BATCH * ITERS / max(t_l50 - t_s50, 1e-9)

    baseline_file = REPO / "CPU_BASELINE.json"
    if baseline_file.exists():
        baseline = json.loads(baseline_file.read_text())["sweeps_per_sec"]
    else:
        baseline = float("nan")

    result = {
        "metric": "bev_e2e_sweeps_per_sec_per_chip",
        "value": round(sweeps_per_sec, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_sec / baseline, 2)
        if baseline == baseline
        else None,
        "detail": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "batch": BATCH,
            "points_per_sweep": N_POINTS,
            "model": "unet_seresnext101 bf16 336x336x6",
            "tpu_optimal_variant_unet_resnet50_sweeps_per_sec": round(sweeps50, 3),
            "cpu_baseline_sweeps_per_sec": baseline if baseline == baseline else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
