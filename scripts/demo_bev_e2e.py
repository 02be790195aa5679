#!/usr/bin/env python
"""End-to-end learning demo: synthetic Lyft data → train a BEV UNet → infer
→ score with the official mAP. Prints one JSON line with the final mAP.

This is the full loop a user of the reference runs (generate → train →
submit → score), compressed onto the synthetic dataset so it executes in
minutes on one chip. Overfits the training scenes by design — the point is
to demonstrate every stage moving real gradients and real boxes, not
generalization.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(steps: int = 300, out_dir: str = "/tmp/lyft3d_demo"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lyft3d_tpu.config import BEVExperiment, OptimizerConfig
    from lyft3d_tpu.data.bev_dataset import generate_bev_dataset
    from lyft3d_tpu.data.bev_pipeline import BEVConfig
    from lyft3d_tpu.data.lyftdb import LyftDB
    from lyft3d_tpu.data.synthetic import make_synthetic_lyft
    from lyft3d_tpu.eval.map_eval import evaluate_map, get_average_precisions
    from lyft3d_tpu.eval.submission import records_from_detections, write_submission
    from lyft3d_tpu.models import build_model
    from lyft3d_tpu.pipelines.bev import BEVInferencePipeline, gt_records
    from lyft3d_tpu.pipelines.bev_train import train_bev

    t0 = time.time()
    out = Path(out_dir)
    classes = ["car", "bus", "truck"]
    root = make_synthetic_lyft(
        out / "lyft", num_scenes=4, samples_per_scene=5, boxes_per_sample=6,
        classes=classes, points_per_sweep=16384, seed=123,
    )
    db = LyftDB(root, root / "data")
    bev_cfg = BEVConfig(num_sweeps=1, max_points=32768)
    tokens = [s["token"] for s in db.sample]
    generate_bev_dataset(db, out / "bev", bev_cfg, tokens)

    exp = BEVExperiment(
        model="unet_resnet34",
        batch_size=4,
        class_weights=(0.2,) + (1.0,) * 9,
        optimizer=OptimizerConfig(
            name="adam", lr=1e-3, grad_accum=1, clip_norm=5.0, total_steps=steps
        ),
        model_dir=str(out / "run"),
    )
    state, model = train_bev(exp, out / "bev", log_every=max(steps // 5, 1),
                             eval_every=0)

    pipe = BEVInferencePipeline(
        db, [(model, state.params)], bev_cfg, max_components=32,
        class_score_threshold=0.05,
    )
    dets = pipe.detect_all(tokens)
    write_submission(out / "submission.csv", dets, tokens)
    preds = records_from_detections(dets)
    gt = gt_records(db, tokens, classes=classes)
    overall, per_class = evaluate_map(gt, preds)
    ap50 = get_average_precisions(gt, preds, classes, 0.5)
    print(
        json.dumps(
            {
                "demo": "bev_train_infer_map",
                "steps": steps,
                "train_samples": len(tokens),
                "mAP": round(overall, 4),
                "AP@0.5_per_class": {c: round(float(a), 4) for c, a in zip(classes, ap50)},
                "wall_s": round(time.time() - t0, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="/tmp/lyft3d_demo")
    args = ap.parse_args()
    main(args.steps, args.out)
