#!/usr/bin/env python
"""Per-part timing of voxelnet_predict at Lyft-9class anchor scale.

The predict stage (decode + score + top-k prefilter + rotated NMS) costs
~19 ms/iter at batch 4 (scripts/profile_unit_middle.py) — a large share of
BOTH voxelnet e2e paths. This bisects it: full-anchor decode, sigmoid+max,
lax.top_k over ~1.1M anchors, the 1000x1000 rotated IoU, and the greedy
fixpoint NMS are timed separately with the bench methodology (on-device
fori_loop, perturbed inputs, differenced loop lengths).

Usage: python scripts/microbench_predict_parts.py [batch] [iters]
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

from lyft3d_tpu.config import SecondExperiment, load_yaml
from lyft3d_tpu.models.second.voxelnet import voxelnet_predict
from lyft3d_tpu.ops.box_ops import decode_boxes
from lyft3d_tpu.ops.nms import rotated_nms
from lyft3d_tpu.ops.rotated_iou import rotated_iou_bev
from lyft3d_tpu.pipelines.second_train import voxelnet_config_from_experiment

REPO = Path(__file__).resolve().parent.parent
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def timed(name, fn, *args):
    def rep(a0, rest, iters):
        def body(i, acc):
            aa = jax.tree.map(
                lambda a: a + i.astype(a.dtype) * 1e-6
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                a0,
            )
            out = fn(aa, *rest)
            return acc + jax.tree_util.tree_reduce(
                lambda s, a: s + jnp.sum(jnp.abs(a).astype(jnp.float32))
                if jnp.issubdtype(a.dtype, jnp.floating)
                or jnp.issubdtype(a.dtype, jnp.integer)
                else s,
                out,
                0.0,
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(2,))
    float(f(args[0], args[1:], 1))
    float(f(args[0], args[1:], 1 + ITERS))

    def once(iters):
        t0 = time.perf_counter()
        float(f(args[0], args[1:], iters))
        return time.perf_counter() - t0

    ts = min(once(1) for _ in range(2))
    tl = min(once(1 + ITERS) for _ in range(2))
    ms = (tl - ts) / ITERS * 1000
    print(f"{name:38s}: {ms:8.2f} ms/iter (batch {B})", flush=True)
    return ms


def main():
    exp = load_yaml(
        SecondExperiment, REPO / "configs" / "second_lyft_9class_sparse.yaml"
    )
    cfg = voxelnet_config_from_experiment(exp)
    anchors, _, _, acls = cfg.make_anchors()
    A = anchors.shape[0]
    print(f"anchors: {A}, classes {cfg.num_classes}, nms_pre {cfg.nms_pre}")
    rng = np.random.RandomState(0)
    box_p = jnp.asarray(rng.randn(B, A, cfg.box_code_size).astype(np.float32))
    cls_p = jnp.asarray(
        (rng.randn(B, A, cfg.num_classes) - 3.0).astype(np.float32)
    )
    dir_p = jnp.asarray(rng.randn(B, A, 2).astype(np.float32))

    timed(
        "decode_boxes (all anchors)",
        lambda bp: jax.vmap(
            lambda b: decode_boxes(b, anchors, cfg.encode_angle_to_vector)
        )(bp),
        box_p,
    )
    timed(
        "sigmoid+max+argmax (all anchors)",
        lambda cp: (
            jnp.max(jax.nn.sigmoid(cp), -1),
            jnp.argmax(cp, -1),
        ),
        cls_p,
    )
    scores = jnp.max(jax.nn.sigmoid(cls_p), -1)
    timed(
        f"lax.top_k k={cfg.nms_pre}",
        lambda s: jax.vmap(lambda x: jax.lax.top_k(x, cfg.nms_pre))(s),
        scores,
    )
    k = cfg.nms_pre
    top_scores, top_idx = jax.vmap(lambda x: jax.lax.top_k(x, k))(scores)
    boxes = jax.vmap(
        lambda b: decode_boxes(b, anchors, cfg.encode_angle_to_vector)
    )(box_p)
    top_boxes = jax.vmap(lambda b, i: b[i])(boxes, top_idx)
    bev = jnp.concatenate(
        [top_boxes[..., 0:2], top_boxes[..., 3:5], top_boxes[..., 6:7]], -1
    )
    timed(
        "gather top boxes",
        lambda b, i: jax.vmap(lambda bb, ii: bb[ii])(b, i),
        boxes,
        top_idx,
    )
    timed(
        f"rotated_iou {k}x{k}",
        lambda bv: jax.vmap(lambda x: rotated_iou_bev(x, x))(bv),
        bev,
    )
    timed(
        "rotated_nms (full)",
        lambda bv, s: jax.vmap(
            lambda x, ss: rotated_nms(x, ss, cfg.nms_iou,
                                      valid=ss >= cfg.score_threshold)
        )(bv, s),
        bev,
        top_scores,
    )
    timed(
        "voxelnet_predict (full)",
        lambda bp, cp, dp: jax.vmap(
            lambda b, c, d: voxelnet_predict(
                {"box": b, "cls": c, "dir": d}, anchors, acls, cfg
            )
        )(bp, cp, dp),
        box_p,
        cls_p,
        dir_p,
    )


if __name__ == "__main__":
    main()
