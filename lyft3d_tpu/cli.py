"""Command-line interface — the framework's runnable surface.

One dispatcher replacing the reference's scattered entry scripts
(``fire.Fire`` in SECOND, argparse mains in the BEV trainers, PointRCNN's
tools/): ``python -m lyft3d_tpu.cli <command> ...``.

Commands:
    synth-data      generate a synthetic Lyft-format dataset
    generate-bev    rasterize BEV PNGs from a Lyft DB
    train-bev       train a BEV segmentation model
    infer-bev       inference → submission CSV (+ optional mAP)
    create-infos    build SECOND training infos from a Lyft DB
    create-gtdb     build the copy-paste GT database
    train-second    train the voxelnet detector
    eval-map        score a submission CSV with the official Lyft mAP
    export-kitti    write a KITTI-layout dataset
    import-weights  convert a torch backbone checkpoint → flax checkpoint
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def _db(args):
    from lyft3d_tpu.data.lyftdb import LyftDB

    return LyftDB(args.data_root, Path(args.data_root) / args.json_dir)


def cmd_synth_data(args):
    from lyft3d_tpu.data.synthetic import make_synthetic_lyft

    root = make_synthetic_lyft(
        args.out, num_scenes=args.scenes, samples_per_scene=args.samples,
        seed=args.seed,
    )
    print(f"synthetic dataset at {root}")


def cmd_generate_bev(args):
    from lyft3d_tpu.data.bev_dataset import generate_bev_dataset
    from lyft3d_tpu.data.bev_pipeline import BEVConfig

    db = _db(args)
    done = generate_bev_dataset(
        db, args.out, BEVConfig(num_sweeps=args.sweeps), overwrite=args.overwrite
    )
    print(f"generated {len(done)} samples into {args.out}")


def cmd_train_bev(args):
    from lyft3d_tpu.config import BEVExperiment, apply_overrides, load_yaml
    from lyft3d_tpu.pipelines.bev_train import train_bev

    cfg = load_yaml(BEVExperiment, args.config) if args.config else BEVExperiment()
    if args.set:
        cfg = apply_overrides(cfg, args.set)
    if args.model_dir:
        cfg.model_dir = args.model_dir
    train_bev(cfg, args.bev_dir)


def cmd_infer_bev(args):
    import jax
    import jax.numpy as jnp

    from lyft3d_tpu.data.bev_pipeline import BEVConfig
    from lyft3d_tpu.eval.map_eval import evaluate_map
    from lyft3d_tpu.eval.submission import records_from_detections, write_submission
    from lyft3d_tpu.models import build_model
    from lyft3d_tpu.pipelines.bev import BEVInferencePipeline, gt_records
    from lyft3d_tpu.train import checkpoint as ckpt
    from lyft3d_tpu.train.trainer import TrainState

    db = _db(args)
    cfg = BEVConfig(num_sweeps=args.sweeps)
    models_and_params = []
    for spec in args.model:  # "name:model_dir" pairs → logit-mean ensemble
        name, _, model_dir = spec.partition(":")
        model = build_model(name, n_classes=10)
        h, w, _ = cfg.shape
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 6), jnp.float32)
        )
        if model_dir:
            from lyft3d_tpu.train.optim import build_optimizer

            template = TrainState.create(params, build_optimizer("adam", 1e-3))
            state, step = ckpt.restore_latest(model_dir, template)
            if step is not None:
                params = state.params
                print(f"{name}: restored step {step} from {model_dir}")
        models_and_params.append((model, params))

    pipe = BEVInferencePipeline(db, models_and_params, cfg)
    tokens = [s["token"] for s in db.sample]
    dets = pipe.detect_all(tokens)
    write_submission(args.out, dets, tokens)
    print(f"wrote {args.out}")
    if args.eval:
        gt = gt_records(db, tokens)
        overall, per_class = evaluate_map(gt, records_from_detections(dets))
        print(json.dumps({"mAP": overall, "per_class": per_class}, indent=2))


def cmd_create_infos(args):
    from lyft3d_tpu.pipelines.second_pipeline import create_infos, save_infos

    db = _db(args)
    infos = create_infos(db, num_sweeps=args.sweeps)
    save_infos(infos, args.out)
    print(f"wrote {len(infos)} infos to {args.out}")


def cmd_create_gtdb(args):
    import numpy as np

    from lyft3d_tpu.data.augment import create_gt_database
    from lyft3d_tpu.pipelines.second_pipeline import (
        LoaderConfig,
        SecondSampleLoader,
        load_infos,
    )

    db = _db(args)
    infos = load_infos(args.infos)
    loader = SecondSampleLoader(
        db, infos, args.classes.split(","), LoaderConfig(num_sweeps=1, augment=False)
    )
    samples = []
    for info in infos:
        pts = loader.load_points(info)
        samples.append(
            {"points": pts, "gt_boxes": info["gt_boxes"], "gt_names": info["gt_names"]}
        )
    create_gt_database(args.out, samples)
    print(f"gt database at {args.out}")


def cmd_train_second(args):
    from lyft3d_tpu.config import SecondExperiment, apply_overrides, load_yaml
    from lyft3d_tpu.pipelines.second_pipeline import (
        LoaderConfig,
        SecondSampleLoader,
        load_infos,
    )
    from lyft3d_tpu.pipelines.second_train import train_second

    exp = load_yaml(SecondExperiment, args.config) if args.config else SecondExperiment()
    if args.set:
        exp = apply_overrides(exp, args.set)
    db = _db(args)
    infos = load_infos(args.infos)
    class_names = [a.class_name for a in exp.anchors]
    db_sampler = None
    if args.gtdb and exp.db_sampler_quota:
        from lyft3d_tpu.data.augment import DataBaseSampler, GTDatabase

        db_sampler = DataBaseSampler(GTDatabase(args.gtdb), exp.db_sampler_quota)
    loader = SecondSampleLoader(
        db, infos, class_names,
        LoaderConfig(num_sweeps=exp.num_sweeps, max_points=exp.data.max_points),
        db_sampler=db_sampler,
    )
    tokens = [i["token"] for i in infos]
    train_second(exp, loader, tokens)


def cmd_train_pointrcnn(args):
    from lyft3d_tpu.models.pointrcnn.net import (
        PointRCNNConfig,
        lyft_pointrcnn_config,
    )
    from lyft3d_tpu.pipelines.pointrcnn_train import (
        KittiLoaderConfig,
        KittiPointRCNNLoader,
        cache_rcnn_samples,
        train_pointrcnn_rpn,
        train_rcnn_offline,
        train_rcnn_online,
    )

    loader = KittiPointRCNNLoader(
        args.kitti_root,
        KittiLoaderConfig(num_points=args.num_points,
                          classes=tuple(args.classes.split(",")),
                          augment=args.augment),
    )
    cfg = (
        # One class per run (train_rcnn.py:222): the first --classes entry
        # selects the CLS_MEAN_SIZE row the coders regress against.
        lyft_pointrcnn_config("train", class_name=args.classes.split(",")[0])
        if args.preset == "lyft"
        else PointRCNNConfig()
    )
    model, params, losses = train_pointrcnn_rpn(
        loader, cfg, steps=args.steps, batch_size=args.batch_size
    )
    print(f"final rpn loss: {losses[-1]:.4f}")
    if args.mode == "rcnn_offline":
        # Staged training (train_rcnn.py:177-190): freeze the RPN, cache
        # its proposals + features, train the RCNN head offline.
        cache = cache_rcnn_samples(model, params, loader, cfg)
        _, _, rcnn_losses = train_rcnn_offline(
            cache, cfg, steps=args.rcnn_steps
        )
        print(f"final rcnn loss: {rcnn_losses[-1]:.4f}")
    elif args.mode == "rcnn":
        # Online mode (train_rcnn.py:177-190, RPN.FIXED): frozen RPN runs
        # per step, live proposals + RoI noise, RCNN trains on the fly.
        _, _, rcnn_losses = train_rcnn_online(
            model, params, loader, cfg, steps=args.rcnn_steps
        )
        print(f"final rcnn loss: {rcnn_losses[-1]:.4f}")


def cmd_serve(args):
    from lyft3d_tpu.serve.viewer import serve

    serve(args.port)


def cmd_eval_map(args):
    from lyft3d_tpu.eval.map_eval import evaluate_map
    from lyft3d_tpu.eval.submission import read_submission, records_from_detections

    db = _db(args)
    from lyft3d_tpu.pipelines.bev import gt_records

    preds = records_from_detections(read_submission(args.submission))
    tokens = sorted({p["sample_token"] for p in preds}) or [
        s["token"] for s in db.sample
    ]
    gt = gt_records(db, tokens)
    overall, per_class = evaluate_map(gt, preds)
    print(json.dumps({"mAP": overall, "per_class": per_class}, indent=2))


def cmd_export_kitti(args):
    from lyft3d_tpu.data.kitti import export_kitti

    db = _db(args)
    out = export_kitti(db, args.out)
    print(f"KITTI tree at {out}")


def cmd_import_weights(args):
    """Torch ImageNet checkpoint → flax checkpoint for `--init-from`-style
    partial restore (the reference's transfer-learning path, modelzoo hub
    weights → models/model.py:50-60 load_pretrain)."""
    import jax
    import jax.numpy as jnp

    from lyft3d_tpu.models import build_model
    from lyft3d_tpu.train import checkpoint as ckpt
    from lyft3d_tpu.utils.torch_import import (
        load_pretrained_backbone,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(args.torch_ckpt)
    model_name = args.model or f"unet_{args.backbone}"
    model = build_model(model_name, n_classes=args.n_classes)
    x = jnp.zeros((1, args.image_size, args.image_size, args.in_channels), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    params = load_pretrained_backbone(
        params, sd, args.backbone, in_channels=args.in_channels, verbose=True
    )
    path = ckpt.save(args.out, {"params": params["params"]}, name=model_name)
    print(f"imported {args.backbone} weights → {path}")


def cmd_run_experiments(args):
    """Sequential experiment queue over BEV config files — capability of
    the reference's batch experiment driver (``second/second/pytorch/
    script_server.py:29-226``: run a list of (config, model_dir) jobs,
    survive per-job failures, record outcomes)."""
    import json
    import time
    import traceback

    from lyft3d_tpu.config import BEVExperiment, apply_overrides, load_yaml
    from lyft3d_tpu.pipelines.bev_train import train_bev

    results = []
    for cfg_path in args.configs:
        cfg = load_yaml(BEVExperiment, cfg_path)
        if args.set:
            cfg = apply_overrides(cfg, args.set)
        t0 = time.time()
        rec = {"config": str(cfg_path), "model_dir": cfg.model_dir}
        try:
            state, _ = train_bev(cfg, args.bev_dir)
            rec.update(status="ok", steps=int(state.step))
        except Exception as e:  # keep the queue going (script_server:198)
            traceback.print_exc()
            rec.update(status="failed", error=f"{type(e).__name__}: {e}")
        rec["wall_s"] = round(time.time() - t0, 1)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if args.summary:
        with open(args.summary, "w") as f:
            json.dump(results, f, indent=2)
        print(f"summary → {args.summary}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lyft3d_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    def add_db_args(sp):
        sp.add_argument("--data-root", required=True)
        sp.add_argument("--json-dir", default="data")

    sp = sub.add_parser("synth-data")
    sp.add_argument("--out", required=True)
    sp.add_argument("--scenes", type=int, default=2)
    sp.add_argument("--samples", type=int, default=3)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_synth_data)

    sp = sub.add_parser("generate-bev")
    add_db_args(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument("--sweeps", type=int, default=1)
    sp.add_argument("--overwrite", action="store_true")
    sp.set_defaults(fn=cmd_generate_bev)

    sp = sub.add_parser("train-bev")
    sp.add_argument("--bev-dir", required=True)
    sp.add_argument("--config")
    sp.add_argument("--model-dir")
    sp.add_argument("--set", nargs="*", default=[])
    sp.set_defaults(fn=cmd_train_bev)

    sp = sub.add_parser("infer-bev")
    add_db_args(sp)
    sp.add_argument("--model", nargs="+", required=True,
                    help="name[:model_dir] — multiple for an ensemble")
    sp.add_argument("--out", required=True)
    sp.add_argument("--sweeps", type=int, default=1)
    sp.add_argument("--eval", action="store_true")
    sp.set_defaults(fn=cmd_infer_bev)

    sp = sub.add_parser("create-infos")
    add_db_args(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument("--sweeps", type=int, default=10)
    sp.set_defaults(fn=cmd_create_infos)

    sp = sub.add_parser("create-gtdb")
    add_db_args(sp)
    sp.add_argument("--infos", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--classes", default="car,truck,bus")
    sp.set_defaults(fn=cmd_create_gtdb)

    sp = sub.add_parser("train-second")
    add_db_args(sp)
    sp.add_argument("--infos", required=True)
    sp.add_argument("--gtdb", help="GT database dir for copy-paste augmentation")
    sp.add_argument("--config")
    sp.add_argument("--set", nargs="*", default=[])
    sp.set_defaults(fn=cmd_train_second)

    sp = sub.add_parser("train-pointrcnn")
    sp.add_argument("--kitti-root", required=True)
    sp.add_argument("--num-points", type=int, default=16384)
    sp.add_argument("--classes", default="car")
    sp.add_argument("--steps", type=int, default=100)
    sp.add_argument("--batch-size", type=int, default=2)
    sp.add_argument("--mode", choices=("rpn", "rcnn", "rcnn_offline"),
                    default="rpn")
    sp.add_argument("--rcnn-steps", type=int, default=100)
    sp.add_argument("--preset", choices=("tiny", "lyft"), default="tiny",
                    help="lyft = reference capacities (cfgs/default.yaml)")
    sp.add_argument("--augment", action="store_true",
                    help="scene-level flip/rotation/scaling augmentation")
    sp.set_defaults(fn=cmd_train_pointrcnn)

    sp = sub.add_parser("serve")
    sp.add_argument("--port", type=int, default=16666)
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("eval-map")
    add_db_args(sp)
    sp.add_argument("--submission", required=True)
    sp.set_defaults(fn=cmd_eval_map)

    sp = sub.add_parser("export-kitti")
    add_db_args(sp)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_export_kitti)

    sp = sub.add_parser("run-experiments")
    sp.add_argument("--bev-dir", required=True)
    sp.add_argument("--configs", nargs="+", required=True)
    sp.add_argument("--set", nargs="*", default=None,
                    help="overrides applied to every config")
    sp.add_argument("--summary", default=None, help="summary JSON path")
    sp.set_defaults(fn=cmd_run_experiments)

    sp = sub.add_parser("import-weights")
    sp.add_argument("--torch-ckpt", required=True)
    sp.add_argument("--backbone", required=True)
    sp.add_argument("--model", default=None)
    sp.add_argument("--out", required=True)
    sp.add_argument("--n-classes", type=int, default=10)
    sp.add_argument("--in-channels", type=int, default=6)
    sp.add_argument("--image-size", type=int, default=336)
    sp.set_defaults(fn=cmd_import_weights)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
