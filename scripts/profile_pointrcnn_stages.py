#!/usr/bin/env python
"""Interior stage timings for PointRCNN's proposal layer + RCNN head at
the honest bench shapes (batch 4, 16384 pts, 1024 NMS candidates, 100
RoIs x 512 points). Complements profile_pointrcnn2.py (whole-stage view).

Same trustworthy harness: jitted scalar reduction, float() per rep.
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

from lyft3d_tpu.models.pointrcnn.net import (
    PointRCNN_RCNN,
    canonical_transform,
    lyft_pointrcnn_config,
)
from lyft3d_tpu.ops.bin_coder import decode_bin_boxes
from lyft3d_tpu.ops.nms import nms_mask_from_iou, rotated_nms
from lyft3d_tpu.ops.rotated_iou import rotated_iou_bev

B, N, K, R, P = 4, 16384, 1024, 100, 512
REPS = 5


def timed(name, fn, *args):
    g = jax.jit(lambda *a: jax.tree.map(
        lambda x: jnp.sum(jnp.abs(x).astype(jnp.float32)), fn(*a)))
    t0 = time.perf_counter()
    jax.tree.map(float, g(*args))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.tree.map(float, g(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts) * 1000:8.2f} ms   (compile {tc:.1f}s)",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    cfg = lyft_pointrcnn_config("test")
    print(f"device: {jax.devices()[0]}  batch={B}", flush=True)

    pts = jnp.asarray(rng.uniform(-40, 40, (B, N, 3)).astype(np.float32))
    reg = jnp.asarray(
        rng.randn(B, N, cfg.rpn_coder.channels).astype(np.float32))
    scores = jnp.asarray(rng.rand(B, N).astype(np.float32))

    timed("decode_bin_boxes (B,16384)",
          jax.vmap(lambda p, r: decode_bin_boxes(p, r, cfg.rpn_coder)),
          pts, reg)
    timed("argsort cut 16384->1024",
          lambda s: jnp.argsort(-s, axis=-1)[:, :K], scores)

    bev = jnp.asarray(
        np.column_stack([
            rng.uniform(-40, 40, (B * K, 2)),
            rng.uniform(1, 5, (B * K, 2)),
            rng.uniform(-np.pi, np.pi, (B * K, 1)),
        ]).astype(np.float32).reshape(B, K, 5))
    sc = jnp.asarray(rng.rand(B, K).astype(np.float32))
    timed("rotated_iou_bev (1024,1024)",
          jax.vmap(lambda b: rotated_iou_bev(b, b)), bev)
    iou = jax.jit(jax.vmap(lambda b: rotated_iou_bev(b, b)))(bev)
    timed("greedy NMS from IoU (1024)",
          jax.vmap(lambda i, s: nms_mask_from_iou(i, s, 0.8)), iou, sc)
    timed("rotated_nms full (1024)",
          jax.vmap(lambda b, s: rotated_nms(b, s, 0.8)), bev, sc)

    # RCNN head: vmapped encoder over (R, P, 3+128) canonical points.
    roi_pts = jnp.asarray(
        rng.randn(B, R, P, 3 + 128).astype(np.float32))
    counts = jnp.full((B, R), P, jnp.int32)
    model = PointRCNN_RCNN(cfg, dtype=jnp.bfloat16, norm="folded")
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            roi_pts[0], counts[0])
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    timed("RCNN head (100 RoIs x 512 pts, vmapped)",
          jax.vmap(lambda rp, c: model.apply(params, rp, c)),
          roi_pts, counts)

    rois = jnp.asarray(
        np.column_stack([
            rng.uniform(-40, 40, (B * R, 3)),
            rng.uniform(1, 5, (B * R, 3)),
            rng.uniform(-np.pi, np.pi, (B * R, 1)),
        ]).astype(np.float32).reshape(B, R, 7))
    pooled = jnp.asarray(rng.randn(B, R, P, 3).astype(np.float32))
    timed("canonical_transform",
          jax.vmap(canonical_transform), pooled, rois)


if __name__ == "__main__":
    main()
