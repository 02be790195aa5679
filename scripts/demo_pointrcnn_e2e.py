#!/usr/bin/env python
"""End-to-end PointRCNN learning demo: synthetic Lyft (cars only) →
KITTI export → RPN training (4-part round-robin) → proposal recall@IoU +
BEV AP. Prints one JSON line.

Companion to demo_bev_e2e.py / demo_second_e2e.py for the third detector
family (overfit-by-design): proves points → PointNet++ RPN → proposals
learns real geometry on TPU.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(steps: int = 200, out_dir: str = "/tmp/lyft3d_pointrcnn_demo"):
    import jax
    import jax.numpy as jnp

    from lyft3d_tpu.data.kitti import export_kitti
    from lyft3d_tpu.data.lyftdb import LyftDB
    from lyft3d_tpu.data.synthetic import make_synthetic_lyft
    from lyft3d_tpu.eval.kitti_eval import kitti_ap, recall_at
    from lyft3d_tpu.models.pointrcnn.net import PointRCNNConfig, proposal_layer
    from lyft3d_tpu.pipelines.pointrcnn_train import (
        KittiLoaderConfig,
        KittiPointRCNNLoader,
        train_pointrcnn_rpn,
    )

    t0 = time.time()
    out = Path(out_dir)
    root = make_synthetic_lyft(
        out / "lyft", num_scenes=2, samples_per_scene=4, boxes_per_sample=4,
        classes=["car"], points_per_sweep=16384, seed=7,
    )
    db = LyftDB(root, root / "data")
    kitti_root = export_kitti(db, out / "kitti")

    cfg = PointRCNNConfig(num_proposals=32, nms_pre=128)
    loader = KittiPointRCNNLoader(
        kitti_root, KittiLoaderConfig(num_points=4096)
    )
    model, params, losses = train_pointrcnn_rpn(
        loader, cfg, steps=steps, batch_size=2, lr=2e-3
    )

    # Proposal-stage eval: recall of GT boxes by the learned proposals.
    @jax.jit
    def infer(xyz, valid):
        feats = jnp.zeros((xyz.shape[0], 1), xyz.dtype)
        rpn_out = model.apply(params, xyz, feats, valid)
        return proposal_layer(xyz, rpn_out["cls"], rpn_out["reg"], valid, cfg)

    gt_frames, det_frames = [], []
    import numpy as np

    for stem in loader.stems:
        s = loader.sample(stem)
        props = jax.device_get(
            infer(jnp.asarray(s["points"]), jnp.asarray(s["points_valid"]))
        )
        det_frames.append(
            {
                "boxes": props["rois"],
                "names": np.asarray(["car"] * len(props["rois"])),
                # roi_scores are already sigmoid probabilities
                "scores": np.where(props["roi_valid"], props["roi_scores"], 0.0),
            }
        )
        g = s["gt_boxes"][s["gt_valid"]]
        gt_frames.append(
            {
                "boxes": g,
                "names": np.asarray(["car"] * len(g)),
                "difficulty": np.zeros(len(g), np.int64),
            }
        )

    recalls = {
        f"recall@{t}": round(recall_at(gt_frames, det_frames, "car", t), 4)
        for t in (0.1, 0.3, 0.5)
    }
    ap_bev = kitti_ap(gt_frames, det_frames, "car", 0.5, "bev")
    print(
        json.dumps(
            {
                "demo": "pointrcnn_rpn_train_recall",
                "steps": steps,
                "frames": len(loader.stems),
                "num_gt": int(sum(len(g["boxes"]) for g in gt_frames)),
                "loss_first": round(float(np.mean(losses[:10])), 4),
                "loss_last": round(float(np.mean(losses[-10:])), 4),
                **recalls,
                "ap_bev@0.5": round(float(ap_bev), 4),
                "wall_s": round(time.time() - t0, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="/tmp/lyft3d_pointrcnn_demo")
    args = ap.parse_args()
    main(args.steps, args.out)
