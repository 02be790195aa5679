#!/usr/bin/env python
"""Per-component timing of the PointRCNN joint forward at Lyft capacities
(16384 pts, SA 4096/1024/256/64, 100 proposals, 512 RoI points —
tools/cfgs/default.yaml:41-48), at the honest bench protocol's batch 4.

Methodology: each timed fn is wrapped to reduce its outputs to ONE f32
scalar inside jit, and the timing loop float()s that scalar — a 4-byte
host transfer that forces real execution. (``block_until_ready`` does NOT
block on the tunneled axon backend — it returns at enqueue, which made a
325 ms ball query read as 0.07 ms; and the fori_loop-differencing harness
of profile_pointrcnn.py deadlocks the compiler when the timed fn itself
contains a long fori_loop. Dispatch+transfer here is ~0.3 ms, small
against the 10-700 ms stages.)

Usage: python scripts/profile_pointrcnn2.py [batch] [repeats]
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
    PointRCNN,
    PointRCNN_RPN,
    lyft_pointrcnn_config,
    proposal_layer,
)
from lyft3d_tpu.ops.pointnet2 import (
    ball_query,
    fps,
    group_points,
    roi_pool3d,
    three_nn,
)

N = 16384
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def timed(name, fn, *args):
    f = jax.jit(fn)
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
    return f(*args)


def main():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        rng.uniform(-40, 40, (B, N, 3)).astype(np.float32)
        * np.array([1.0, 1.0, 0.04], np.float32)
    )
    valid = jnp.ones((B, N), bool)
    print(f"device: {jax.devices()[0]}  batch={B}", flush=True)
    cfg = lyft_pointrcnn_config("test")

    timed("fps 16384->4096 (batched)",
          jax.vmap(lambda p, v: fps(p, v, 4096)), pts, valid)

    sub = pts[:, :4096]
    subv = valid[:, :4096]
    timed("ball_query 4096q/16384p r0.5 k32 (x1 radius)",
          jax.vmap(lambda q, p, v: ball_query(q, p, v, 0.5, 32)),
          sub, pts, valid)
    timed("three_nn 16384u/4096k",
          jax.vmap(lambda u, k, kv: three_nn(u, k, kv)),
          pts, sub, subv)

    feats = jnp.zeros((B, N, 1))
    rpn = PointRCNN_RPN(cfg, dtype=jnp.bfloat16, norm="folded")
    rpn_params = jax.eval_shape(
        rpn.init, jax.random.PRNGKey(0), pts[0], feats[0], valid[0])
    rpn_params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), rpn_params)
    rpn_out = timed(
        "RPN (4xSA-MSG + 4xFP + heads)",
        jax.vmap(lambda p, f, v: rpn.apply(rpn_params, p, f, v),
                 in_axes=(0, 0, 0)),
        pts, feats, valid)

    timed("proposal_layer (decode + NMS -> 100)",
          jax.vmap(lambda p, c, r, v: proposal_layer(p, c, r, v, cfg)),
          pts, rpn_out["cls"], rpn_out["reg"], valid)

    props = jax.jit(jax.vmap(
        lambda p, c, r, v: proposal_layer(p, c, r, v, cfg)
    ))(pts, rpn_out["cls"], rpn_out["reg"], valid)

    timed("roi_pool3d 100x512",
          jax.vmap(lambda p, f, v, r: roi_pool3d(
              p, f, v, r, num_sampled=cfg.roi_points,
              extra_width=cfg.roi_extra_width)),
          pts, rpn_out["point_features"], valid, props["rois"])

    model = PointRCNN(cfg, dtype=jnp.bfloat16, norm="folded")
    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), pts[0], None, valid[0])
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    timed("JOINT forward (batch)",
          jax.vmap(lambda p, v: model.apply(params, p, None, v)), pts, valid)


if __name__ == "__main__":
    main()
