"""SECOND/voxelnet training driver.

Capability of ``second/second/pytorch/train.py:137-464`` ``train()``: config
→ builder chain → step loop with periodic eval + resilient checkpointing —
here one jitted step fuses on-device voxelization, target assignment, the
network, and the loss.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.config import SecondExperiment, snapshot_config
from lyft3d_tpu.models.second.voxelnet import (
    VoxelNet,
    VoxelNetConfig,
    voxelnet_loss,
    voxelnet_predict,
)
from lyft3d_tpu.ops.anchors import AnchorSpec, assign_targets
from lyft3d_tpu.ops.voxelize import VoxelGrid, voxelize
from lyft3d_tpu.parallel.mesh import make_data_mesh, replicate
from lyft3d_tpu.pipelines.second_pipeline import (
    SecondSampleLoader,
    detections_to_world_records,
)
from lyft3d_tpu.train.optim import build_optimizer
from lyft3d_tpu.train.trainer import Trainer, TrainerConfig


def voxelnet_config_from_experiment(exp: SecondExperiment, **overrides) -> VoxelNetConfig:
    grid = VoxelGrid(
        point_cloud_range=tuple(exp.point_cloud_range),
        voxel_size=tuple(exp.voxel_size),
        block_filtering=exp.block_filtering,
        block_factor=exp.block_factor,
        block_size=exp.block_size,
        height_threshold=exp.height_threshold,
    )
    specs = tuple(
        AnchorSpec(
            size=tuple(a.size),
            z_center=a.z_center,
            matched_threshold=a.matched_threshold,
            unmatched_threshold=a.unmatched_threshold,
            class_id=i + 1,
        )
        for i, a in enumerate(exp.anchors)
    )
    kwargs = dict(
        grid=grid,
        max_voxels=exp.max_voxels,
        max_points_per_voxel=exp.max_points_per_voxel,
        encoder=exp.encoder,
        middle=exp.middle,
        middle_features=tuple(exp.middle_features),
        middle_max_voxels=tuple(exp.middle_max_voxels),
        middle_norm=exp.middle_norm,
        middle_z_slab=exp.middle_z_slab,
        similarity=exp.similarity,
        anchor_specs=specs,
        rpn_layer_nums=tuple(exp.rpn_layer_nums),
        rpn_strides=tuple(exp.rpn_strides),
        rpn_filters=tuple(exp.rpn_filters),
        rpn_up_strides=tuple(exp.rpn_up_strides),
        rpn_up_filters=tuple(exp.rpn_up_filters),
    )
    kwargs.update(overrides)  # experiment-derived fields are overridable too
    return VoxelNetConfig(**kwargs)


def make_second_loss_fn(vcfg: VoxelNetConfig):
    from lyft3d_tpu.ops.anchors import anchors_area_mask, bev_occupancy_mask
    from lyft3d_tpu.ops.box_ops import box_corners_2d, corners_to_standup_2d

    anchors, mt, ut, acls = vcfg.make_anchors()
    abev = jnp.concatenate([anchors[:, 0:2], anchors[:, 3:5], anchors[:, 6:7]], -1)
    anchor_standup = corners_to_standup_2d(box_corners_2d(abev))
    nx, ny, _ = vcfg.grid.grid_size

    def loss_fn(model, params, batch, rng):
        vox = jax.vmap(
            lambda p, v: voxelize(
                p, v, vcfg.grid, vcfg.max_voxels, vcfg.max_points_per_voxel
            )
        )(batch["points"], batch["points_valid"])
        if vcfg.anchor_area_threshold > 0:
            # Don't-care anchors over empty BEV area (anchor mask cumsum
            # trick, data/preprocess.py:348-359).
            amask = jax.vmap(
                lambda c, vv: anchors_area_mask(
                    anchor_standup,
                    bev_occupancy_mask(c, vv, (ny, nx)),
                    vcfg.grid.point_cloud_range,
                    min_area=vcfg.anchor_area_threshold,
                )
            )(vox["coords"], vox["voxel_valid"])
        else:
            amask = jnp.ones((batch["points"].shape[0], anchors.shape[0]), bool)
        if vcfg.similarity == "rotated" and vcfg.anchor_area_threshold > 0:
            # Rotated IoU only affordable on the mask-pruned anchor subset.
            from lyft3d_tpu.ops.anchors import assign_targets_pruned

            tgts = jax.vmap(
                lambda g, c, v, m: assign_targets_pruned(
                    anchors, acls, mt, ut, g, c, v, m,
                    max_active=vcfg.max_active_anchors, similarity="rotated",
                )
            )(batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"], amask)
        else:
            tgts = jax.vmap(
                lambda g, c, v, m: assign_targets(
                    anchors, acls, mt, ut, g, c, v, anchor_mask=m,
                    similarity=vcfg.similarity,
                )
            )(batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"], amask)
        preds = model.apply(
            params, vox["voxels"], vox["num_points"], vox["coords"], vox["voxel_valid"]
        )
        return voxelnet_loss(preds, tgts, vcfg)

    return loss_fn


def train_second(
    exp: SecondExperiment,
    loader: SecondSampleLoader,
    train_tokens: Sequence[str],
    vcfg: Optional[VoxelNetConfig] = None,
    n_devices: Optional[int] = None,
    log_every: int = 50,
    num_workers: int = 4,
    dtype=jnp.bfloat16,
):
    vcfg = vcfg or voxelnet_config_from_experiment(exp)
    model = VoxelNet(vcfg, dtype=dtype)

    sample0 = loader.batch(list(train_tokens)[: exp.batch_size])
    vox0 = jax.vmap(
        lambda p, v: voxelize(p, v, vcfg.grid, vcfg.max_voxels, vcfg.max_points_per_voxel)
    )(jnp.asarray(sample0["points"]), jnp.asarray(sample0["points_valid"]))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), vox0["voxels"], vox0["num_points"],
        vox0["coords"], vox0["voxel_valid"],
    )

    opt = exp.optimizer
    tx = build_optimizer(
        opt.name, opt.lr, total_steps=opt.total_steps, weight_decay=opt.weight_decay,
        clip_norm=opt.clip_norm, grad_accum=opt.grad_accum,
    )
    mesh = make_data_mesh(exp.batch_size, n_devices)
    tcfg = TrainerConfig(
        model_dir=exp.model_dir, total_steps=opt.total_steps, log_every=log_every,
        eval_every=0, ckpt_every=max(opt.total_steps // 4, 1),
    )
    snapshot_config(exp, exp.model_dir)
    trainer = Trainer(model, tx, make_second_loss_fn(vcfg), tcfg, mesh=mesh)
    state = trainer.init_or_resume(replicate(mesh, params))

    def token_chunks():
        rng = np.random.RandomState(exp.data.seed)
        toks = list(train_tokens)
        while True:
            rng.shuffle(toks)
            for i in range(0, len(toks) - exp.batch_size + 1, exp.batch_size):
                yield toks[i : i + exp.batch_size]

    def assemble(chunk):
        b = loader.batch(chunk, train=True)
        return {k: jnp.asarray(v) for k, v in b.items()}

    from lyft3d_tpu.data.prefetch import MappedPrefetcher

    # Work items are cheap token chunks; the heavy sample assembly
    # (multi-sweep load + augmentation) runs on parallel workers.
    state = trainer.fit(
        state,
        iter(MappedPrefetcher(token_chunks, assemble, num_workers=num_workers,
                              depth=4)),
    )
    return state, model, vcfg


def evaluate_second(
    model, params, vcfg: VoxelNetConfig, loader: SecondSampleLoader,
    tokens: Sequence[str], class_names: Sequence[str],
    measure_time: bool = False,
    batch_size: int = 4,
) -> List[dict]:
    """Run predict over tokens → world-frame detection records
    (the evaluation_nusc path, nuscenes_dataset.py:346-400), in fixed-size
    padded batches (one jitted program; per-sample dispatch pays a host
    round-trip each). With ``measure_time`` prints per-section averaged ms —
    the reference's ``evaluate --measure_time=True`` mode (train.py:550-573).
    """
    from lyft3d_tpu.utils.profiler import SectionTimers

    anchors, _, _, acls = vcfg.make_anchors()
    timers = SectionTimers(enabled=measure_time)

    @jax.jit
    def infer(points, valid):
        vox = jax.vmap(
            lambda p, v: voxelize(
                p, v, vcfg.grid, vcfg.max_voxels, vcfg.max_points_per_voxel
            )
        )(points, valid)
        preds = model.apply(
            params, vox["voxels"], vox["num_points"], vox["coords"], vox["voxel_valid"]
        )
        return jax.vmap(
            lambda b, c, d: voxelnet_predict(
                {"box": b, "cls": c, "dir": d}, anchors, acls, vcfg
            )
        )(preds["box"], preds["cls"], preds["dir"])

    records: List[dict] = []
    toks = list(tokens)
    for i in range(0, len(toks), batch_size):
        chunk = toks[i : i + batch_size]
        padded = chunk + [chunk[-1]] * (batch_size - len(chunk))
        with timers.section("prep"):
            samples = [loader.sample(t, train=False) for t in padded]
            pts = jnp.asarray(np.stack([s["points"] for s in samples]))
            val = jnp.asarray(np.stack([s["points_valid"] for s in samples]))
        with timers.section("infer") as t:
            det = infer(pts, val)
            t.set_sentinel(det["scores"])
        with timers.section("postprocess"):
            det = jax.device_get(det)
            for j, tok in enumerate(chunk):
                info = loader.infos[tok]
                records.extend(
                    detections_to_world_records(
                        info, det["boxes"][j], det["scores"][j],
                        det["classes"][j], det["valid"][j], class_names,
                    )
                )
    if measure_time:
        total = sum(timers.totals.values())
        print(
            f"sec_per_example: {total / max(len(toks), 1):.4f} ({timers.report()})"
        )
    return records
