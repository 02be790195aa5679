#!/usr/bin/env python
"""Per-component timing of the PointRCNN joint forward at Lyft capacities
(16384 pts, SA 4096/1024/256/64, 100 proposals, 512 RoI points —
tools/cfgs/default.yaml:41-48).

Same methodology as profile_e2e.py: on-device fori_loops with per-iteration
input perturbation, differencing two loop lengths to cancel dispatch cost.
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
    fps_pallas,
    furthest_point_sample,
    group_points,
    roi_pool3d,
)

N = 16384
ITERS = 4


def timed(name, fn, *args):
    def rep(args, iters):
        def body(i, acc):
            out = fn(*((args[0] + i.astype(args[0].dtype) * 1e-6,) + args[1:]))
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
    print(f"{name}: {(tb - ta) / ITERS * 1000:.2f} ms/iter", flush=True)


def main():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.column_stack(
            [
                rng.uniform(-40, 40, N),
                rng.uniform(-40, 40, N),
                rng.uniform(-2, 1, N),
            ]
        ).astype(np.float32)
    )
    valid = jnp.ones((N,), bool)
    print(f"device: {jax.devices()[0]}", flush=True)

    timed("fps 16384->4096 (jnp)", lambda p, v: furthest_point_sample(p, v, 4096), pts, valid)
    try:
        timed("fps 16384->4096 (pallas)", lambda p, v: fps_pallas(p, v, 4096), pts, valid)
    except Exception as e:
        print(f"fps pallas failed: {e!r}"[:200], flush=True)

    sub = pts[:4096]
    subv = valid[:4096]
    timed(
        "ball_query 4096q/16384p r0.5 k32",
        lambda q, p, v: ball_query(q, p, v, 0.5, 32),
        sub, pts, valid,
    )

    cfg = lyft_pointrcnn_config("test")
    rpn = PointRCNN_RPN(cfg)
    rpn_params = jax.eval_shape(rpn.init, jax.random.PRNGKey(0), pts, jnp.zeros((N, 1)), valid)
    rpn_params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), rpn_params)
    timed("RPN (4xSA-MSG + 4xFP + heads)", lambda p, f, v: rpn.apply(rpn_params, p, f, v), pts, jnp.zeros((N, 1)), valid)

    out = jax.jit(lambda p, f, v: rpn.apply(rpn_params, p, f, v))(pts, jnp.zeros((N, 1)), valid)
    cls, reg, pfeat = out["cls"], out["reg"], out["point_features"]
    timed(
        "proposal_layer (decode + NMS -> 100)",
        lambda p, c, r, v: proposal_layer(p, c, r, v, cfg),
        pts, cls, reg, valid,
    )

    props = jax.jit(lambda p, c, r, v: proposal_layer(p, c, r, v, cfg))(pts, cls, reg, valid)
    rois = props["rois"]
    timed(
        "roi_pool3d 100x512",
        lambda p, f, v, r: roi_pool3d(p, f, v, r, num_sampled=cfg.roi_points,
                                      extra_width=cfg.roi_extra_width),
        pts, pfeat, valid, rois,
    )

    model = PointRCNN(cfg)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), pts, None, valid)
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    timed("JOINT forward", lambda p, v: model.apply(params, p, None, v), pts, valid)


if __name__ == "__main__":
    main()
