#!/usr/bin/env python
"""End-to-end SECOND/voxelnet learning demo: synthetic Lyft data → infos →
train PointPillars-style voxelnet → predict → world-frame records → official
mAP. Prints one JSON line.

Companion to demo_bev_e2e.py for the detector family (overfit-by-design).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(steps: int = 1000, out_dir: str = "/tmp/lyft3d_second_demo",
         sparse: bool = False):
    import jax

    from lyft3d_tpu.config import AnchorConfig, OptimizerConfig, SecondExperiment
    from lyft3d_tpu.data.lyftdb import LyftDB
    from lyft3d_tpu.data.synthetic import make_synthetic_lyft
    from lyft3d_tpu.eval.map_eval import evaluate_map, get_average_precisions
    from lyft3d_tpu.pipelines.bev import gt_records
    from lyft3d_tpu.pipelines.second_pipeline import (
        LoaderConfig,
        SecondSampleLoader,
        create_infos,
    )
    from lyft3d_tpu.pipelines.second_train import evaluate_second, train_second

    t0 = time.time()
    out = Path(out_dir)
    classes = ["car", "bus", "truck"]
    root = make_synthetic_lyft(
        out / "lyft", num_scenes=4, samples_per_scene=5, boxes_per_sample=6,
        classes=classes, points_per_sweep=16384, seed=321,
    )
    db = LyftDB(root, root / "data")
    infos = create_infos(db, num_sweeps=1, classes=classes)

    # --sparse: the z-slab UNIT sparse middle (SpMiddleFHD capability, the
    # production sparse path — configs/second_lyft_9class_sparse.yaml) at a
    # scaled-down geometry — 3D voxels (nz 16), 1 pt/voxel, simple encoder —
    # exercising the fused stencil forward AND reverse-stencil backward in
    # a real learning loop.
    import os

    middle_kw = dict(
        voxel_size=(0.8, 0.8, 0.5), max_voxels=8192, max_points_per_voxel=1,
        encoder="simple",
        # Override hook for learning-curve root-causing: run the SAME
        # demo through the per-voxel oracle ("sparse") or the dense-z
        # column formulation ("sparse_columns").
        middle=os.environ.get("LYFT3D_SPARSE_MIDDLE", "sparse_units"),
        middle_z_slab=8,
        middle_features=(16, 32, 64),
        middle_max_voxels=(8192, 4096, 2048),
        # up0=8 puts the anchor grid at 0.8·8·2/8 = 1.6 m stride (40x72
        # positions, 55 positive anchors on the first synthetic frame) —
        # the same granularity class as the pillars demo. The earlier
        # (1, 2, 4) left anchors at 6.4 m: ~10x17 positions, ~4 positive
        # anchors per frame (vs 226 for pillars on the same scene), which
        # is why the sparse learning curve stayed ~0 while its train loss
        # fell normally — the detector had almost nothing it could match.
        rpn_up_strides=(8, 16, 32),
    ) if sparse else dict(
        voxel_size=(0.4, 0.4, 8.0), max_voxels=8192, max_points_per_voxel=8,
        encoder="pillars",
    )
    exp = SecondExperiment(
        # Asymmetric range covering the synthetic scene layout (objects sit
        # ahead-right of the ego track): x ∈ [−20, 84], y ∈ [−36, 28].
        point_cloud_range=(-20.0, -36.0, -3.0, 84.0, 28.0, 5.0),
        **middle_kw,
        anchors=(
            # z centers in the SENSOR frame: box center = h/2 − lidar
            # mount height (1.8 m in the synthetic rig).
            AnchorConfig("car", (1.93, 4.76, 1.72), -0.94, 0.45, 0.3),
            AnchorConfig("bus", (2.96, 12.34, 3.44), -0.08, 0.25, 0.15),
            AnchorConfig("truck", (2.84, 10.24, 3.44), -0.08, 0.25, 0.15),
        ),
        batch_size=4,
        num_sweeps=1,
        optimizer=OptimizerConfig(name="adam", lr=1.5e-3, grad_accum=1,
                                  clip_norm=10.0, total_steps=steps),
        model_dir=str(out / "run"),
    )
    loader = SecondSampleLoader(
        db, infos, classes,
        LoaderConfig(max_points=24576, num_sweeps=1, augment=True,
                     per_object_noise=False),
    )
    tokens = [i["token"] for i in infos]
    state, model, vcfg = train_second(exp, loader, tokens, log_every=max(steps // 5, 1))

    preds = evaluate_second(
        model, state.params, vcfg, loader, tokens, classes, measure_time=True
    )
    gt = gt_records(db, tokens, classes=classes)
    overall, per_class = evaluate_map(gt, preds)
    ap50 = get_average_precisions(gt, preds, classes, 0.5)
    print(
        json.dumps(
            {
                "demo": "second_sparse_train_predict_map" if sparse
                else "second_train_predict_map",
                "steps": steps,
                "train_samples": len(tokens),
                "mAP": round(overall, 4),
                "AP@0.5_per_class": {c: round(float(a), 4) for c, a in zip(classes, ap50)},
                "num_pred_records": len(preds),
                "wall_s": round(time.time() - t0, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--out", default="/tmp/lyft3d_second_demo")
    ap.add_argument("--sparse", action="store_true",
                    help="column-sparse middle (SpMiddleFHD path)")
    args = ap.parse_args()
    main(args.steps, args.out, sparse=args.sparse)
