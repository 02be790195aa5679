#!/usr/bin/env python
"""End-to-end two-stage PointRCNN learning demo: synthetic Lyft (cars only)
→ KITTI export → RPN training (4-part round-robin) → online RCNN training
(frozen RPN, live proposals) → joint eval where the RCNN's decoded REFINED
boxes are compared against the raw proposals (recall@IoU + BEV AP).
Prints one JSON line.

Companion to demo_bev_e2e.py / demo_second_e2e.py for the third detector
family (overfit-by-design): proves points → PointNet++ RPN → proposals →
RCNN refinement learns real geometry on TPU.
"""

from __future__ import annotations

import json
import os
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
    from lyft3d_tpu.models.pointrcnn.net import PointRCNNConfig
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
    if os.environ.get("LYFT3D_GRID_BQ"):
        # A/B hook: run the SA stages through the grid-bucketed ball
        # query (the production lyft config's default) on this demo too.
        import dataclasses

        cfg = dataclasses.replace(
            cfg, grid_bounds=((-64.0, 64.0), (-8.0, 120.0))
        )
    loader = KittiPointRCNNLoader(
        kitti_root, KittiLoaderConfig(num_points=4096)
    )
    model, params, losses = train_pointrcnn_rpn(
        loader, cfg, steps=steps, batch_size=2, lr=2e-3
    )

    # Stage 2: online RCNN training on live frozen-RPN proposals.
    from lyft3d_tpu.models.pointrcnn.net import PointRCNN
    from lyft3d_tpu.pipelines.pointrcnn_train import (
        assemble_joint_params,
        train_rcnn_online,
    )

    rcnn_model, rcnn_params, rcnn_losses = train_rcnn_online(
        model, params, loader, cfg, steps=max(steps // 2, 50), lr=1e-3
    )

    import numpy as np

    s0 = loader.sample(loader.stems[0])
    joint = PointRCNN(cfg)
    joint_params = assemble_joint_params(
        joint, params, rcnn_params,
        (jnp.asarray(s0["points"]), jnp.asarray(s0["points_valid"])),
    )

    # Joint eval: compare raw proposals against RCNN-refined boxes.
    @jax.jit
    def infer(xyz, valid):
        return joint.apply(joint_params, xyz, None, valid)

    gt_frames, prop_frames, ref_frames = [], [], []
    for stem in loader.stems:
        s = loader.sample(stem)
        out = jax.device_get(
            infer(jnp.asarray(s["points"]), jnp.asarray(s["points_valid"]))
        )
        props = out["proposals"]
        rcnn_score = 1.0 / (1.0 + np.exp(-out["rcnn"]["cls"]))
        ok = props["roi_valid"] & ~out["roi_empty"]
        prop_frames.append(
            {
                "boxes": props["rois"],
                "names": np.asarray(["car"] * len(props["rois"])),
                "scores": np.where(props["roi_valid"], props["roi_scores"], 0.0),
            }
        )
        ref_frames.append(
            {
                "boxes": out["refined"],
                "names": np.asarray(["car"] * len(out["refined"])),
                "scores": np.where(ok, rcnn_score, 0.0),
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

    recalls = {}
    for t in (0.1, 0.3, 0.5, 0.7):
        recalls[f"proposal_recall@{t}"] = round(
            recall_at(gt_frames, prop_frames, "car", t), 4
        )
        recalls[f"refined_recall@{t}"] = round(
            recall_at(gt_frames, ref_frames, "car", t), 4
        )
    ap_bev = kitti_ap(gt_frames, prop_frames, "car", 0.5, "bev")
    ap_bev_ref = kitti_ap(gt_frames, ref_frames, "car", 0.5, "bev")
    print(
        json.dumps(
            {
                "demo": "pointrcnn_two_stage_train_recall",
                "steps": steps,
                "frames": len(loader.stems),
                "num_gt": int(sum(len(g["boxes"]) for g in gt_frames)),
                "loss_first": round(float(np.mean(losses[:10])), 4),
                "loss_last": round(float(np.mean(losses[-10:])), 4),
                "rcnn_loss_first": round(float(np.mean(rcnn_losses[:10])), 4),
                "rcnn_loss_last": round(float(np.mean(rcnn_losses[-10:])), 4),
                **recalls,
                "ap_bev@0.5_proposals": round(float(ap_bev), 4),
                "ap_bev@0.5_refined": round(float(ap_bev_ref), 4),
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
