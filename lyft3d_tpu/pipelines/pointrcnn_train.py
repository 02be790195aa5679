"""PointRCNN training/eval driver over a KITTI-layout dataset.

Capability of the reference's PointRCNN tooling:
- ``KittiRCNNDataset.get_rpn_sample`` (kitti_rcnn_dataset.py:286-404):
  lidar load, range filter, near/far-aware fixed-16384-point subsampling
  (:327-343), scene augmentation, per-point labels;
- the 4-part round-robin training loop (``tools/train_rcnn.py:285-342``) via
  ``data.splits.split_parts``;
- ``eval_one_epoch_*`` (``tools/eval_rcnn.py``): inference → NMS → KITTI
  label files + recall stats + AP.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.data.kitti import (
    Calibration,
    Object3d,
    box_camera_to_lidar,
    box_lidar_to_camera,
    read_label_file,
    write_label_file,
)
from lyft3d_tpu.data.splits import split_parts
from lyft3d_tpu.models.pointrcnn.net import (
    PointRCNN,
    PointRCNNConfig,
    PointRCNN_RPN,
    rpn_loss,
    rpn_point_labels,
)
from lyft3d_tpu.train.optim import build_optimizer


@dataclass
class KittiLoaderConfig:
    num_points: int = 16384
    near_radius: float = 40.0
    classes: tuple = ("car",)
    range_xyz: tuple = (80.0, 80.0, 5.0)
    max_gt: int = 32
    # Scene-level augmentation (``data_augmentation``,
    # kitti_rcnn_dataset.py:555): random flip + global rotation + scaling
    # applied jointly to points and GT boxes. Off for eval loaders.
    augment: bool = False
    aug_rot_range: float = float(np.pi / 4)
    aug_scale_range: tuple = (0.95, 1.05)


class KittiPointRCNNLoader:
    """KITTI tree (velodyne/, calib/, label_2/) → fixed-size training arrays.

    Optional ``db_sampler`` applies GT copy-paste augmentation before
    subsampling (``apply_gt_aug_to_one_scene``, kitti_rcnn_dataset.py:450).
    """

    def __init__(self, root, cfg: KittiLoaderConfig = KittiLoaderConfig(), seed: int = 0,
                 db_sampler=None):
        self.root = Path(root)
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self.db_sampler = db_sampler
        self.stems = sorted(p.stem for p in (self.root / "velodyne").glob("*.bin"))

    def subsample(self, pts: np.ndarray) -> np.ndarray:
        """Near/far-stratified fixed-count subsampling (:327-343): keep all
        far points, fill the quota with random near points."""
        n = self.cfg.num_points
        if len(pts) <= n:
            pad = np.zeros((n - len(pts), pts.shape[1]), pts.dtype)
            return np.concatenate([pts, pad]), len(pts)
        dist = np.linalg.norm(pts[:, :2], axis=1)
        far = dist >= self.cfg.near_radius
        far_idx = np.flatnonzero(far)
        near_idx = np.flatnonzero(~far)
        if len(far_idx) >= n:
            pick = self.rng.choice(far_idx, n, replace=False)
        else:
            extra = self.rng.choice(near_idx, n - len(far_idx), replace=False)
            pick = np.concatenate([far_idx, extra])
        return pts[pick], n

    def sample(self, stem: str) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        raw = np.fromfile(self.root / "velodyne" / f"{stem}.bin", np.float32).reshape(-1, 4)
        rx, ry, rz = cfg.range_xyz
        keep = (
            (np.abs(raw[:, 0]) < rx) & (np.abs(raw[:, 1]) < ry) & (np.abs(raw[:, 2]) < rz)
        )
        pts, count = self.subsample(raw[keep])
        valid = np.zeros(cfg.num_points, bool)
        valid[:count] = True

        calib = Calibration.from_file(self.root / "calib" / f"{stem}.txt")
        objects = read_label_file(self.root / "label_2" / f"{stem}.txt")
        raw_boxes, raw_names = [], []
        for obj in objects:
            if obj.cls_type not in cfg.classes:
                continue
            raw_boxes.append(
                box_camera_to_lidar(obj.pos, (obj.h, obj.w, obj.l), obj.ry, calib)
            )
            raw_names.append(obj.cls_type)
        boxes_arr = (
            np.stack(raw_boxes) if raw_boxes else np.zeros((0, 7), np.float64)
        )
        names_arr = np.asarray(raw_names)

        if self.db_sampler is not None:
            extra = self.db_sampler.sample_all(boxes_arr, names_arr)
            if extra is not None:
                boxes_arr = np.concatenate([boxes_arr, extra["boxes"]])
                names_arr = np.concatenate([names_arr, extra["names"]])
                # Paste the sampled crops into the (already subsampled)
                # point buffer by replacing random background slots.
                paste = extra["points"][:, :3].astype(np.float32)
                n_paste = min(len(paste), pts.shape[0] // 4)
                if n_paste:
                    slots = self.rng.choice(pts.shape[0], n_paste, replace=False)
                    pts[slots, :3] = paste[:n_paste]
                    if pts.shape[1] > 3:
                        pts[slots, 3:] = 0.0

        if cfg.augment:
            from lyft3d_tpu.data.augment import (
                global_rotation,
                global_scaling,
                random_flip,
            )

            boxes_arr = boxes_arr.astype(np.float32)
            pts, boxes_arr = random_flip(pts, boxes_arr, self.rng)
            pts, boxes_arr, _ = global_rotation(
                pts, boxes_arr, self.rng,
                rotation=(-cfg.aug_rot_range, cfg.aug_rot_range),
            )
            pts, boxes_arr, _ = global_scaling(
                pts, boxes_arr, self.rng, scale=cfg.aug_scale_range
            )

        gt = np.zeros((cfg.max_gt, 7), np.float32)
        gt_valid = np.zeros(cfg.max_gt, bool)
        k = 0
        for b in boxes_arr:
            if k >= cfg.max_gt:
                break
            gt[k] = b
            gt_valid[k] = True
            k += 1
        return {
            "points": pts[:, :3].astype(np.float32),
            "points_valid": valid,
            "gt_boxes": gt,
            "gt_valid": gt_valid,
            "stem": stem,
        }

    def batch(self, stems: Sequence[str]) -> Dict[str, np.ndarray]:
        ss = [self.sample(s) for s in stems]
        return {
            k: np.stack([s[k] for s in ss])
            for k in ("points", "points_valid", "gt_boxes", "gt_valid")
        }


def make_rpn_step(model: PointRCNN_RPN, cfg: PointRCNNConfig, tx):
    """One jitted RPN training step over a batch (vmap inside)."""

    def loss_fn(params, batch):
        def one(xyz, valid, gt, gt_valid):
            labels, assigned = rpn_point_labels(xyz, gt, gt_valid)
            feats = jnp.zeros((xyz.shape[0], 1), xyz.dtype)
            out = model.apply(params, xyz, feats, valid)
            return rpn_loss(out, xyz, labels, assigned, gt, cfg)

        losses, metrics = jax.vmap(one)(
            batch["points"], batch["points_valid"], batch["gt_boxes"], batch["gt_valid"]
        )
        return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, metrics)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    return step


def train_pointrcnn_rpn(
    loader: KittiPointRCNNLoader,
    cfg: PointRCNNConfig,
    steps: int = 100,
    batch_size: int = 2,
    lr: float = 2e-3,
    num_parts: int = 4,
    seed: int = 0,
    num_workers: int = 4,
    n_devices: Optional[int] = None,
):
    """RPN training with the reference's 4-part round-robin over the split.

    Sample assembly runs on ``num_workers`` prefetch threads (the
    reference's DataLoader workers, train_rcnn.py:80-105) — the schedule of
    stem picks is deterministic given ``seed``, so the parallel map changes
    nothing about which batches train.

    ``n_devices`` > 1 trains data-parallel over the ICI mesh: the batch is
    sharded along its leading axis, params/opt-state replicated, and XLA
    inserts the gradient all-reduce — the TPU-native equivalent of the
    reference's ``--mgpus`` ``DataParallel`` (train_rcnn.py:252-253), which
    covered PointRCNN as well as SECOND."""
    model = PointRCNN_RPN(cfg)
    b0 = loader.batch(loader.stems[:batch_size])
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        jnp.asarray(b0["points"][0]),
        jnp.zeros((b0["points"].shape[1], 1)),
        jnp.asarray(b0["points_valid"][0]),
    )
    tx = build_optimizer("adam_onecycle", lr, total_steps=steps)
    opt_state = tx.init(params)
    step = make_rpn_step(model, cfg, tx)

    mesh = None
    if n_devices is not None and n_devices > 1:
        from lyft3d_tpu.parallel.mesh import make_data_mesh, replicate

        mesh = make_data_mesh(batch_size, n_devices)
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)

    parts = split_parts(loader.stems, num_parts)
    rng = np.random.RandomState(seed)
    schedule = []
    while len(schedule) < steps:
        for part in parts:  # round-robin (train_rcnn.py:288-342)
            stems = list(part)
            if not stems:  # fewer frames than parts
                continue
            rng.shuffle(stems)
            for j in range(0, max(len(stems) - batch_size + 1, 1), batch_size):
                if len(schedule) >= steps:
                    break
                schedule.append(stems[j : j + batch_size] or stems[:1])

    from lyft3d_tpu.data.prefetch import MappedPrefetcher

    batches = MappedPrefetcher(
        lambda: iter(schedule), loader.batch, num_workers=num_workers
    )
    losses = []
    for batch_np in batches:
        if mesh is not None:
            from lyft3d_tpu.parallel.mesh import shard_batch

            batch = shard_batch(mesh, batch_np)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        params, opt_state, loss, metrics = step(params, opt_state, batch)
        losses.append(float(loss))
    return model, params, losses


def eval_pointrcnn(
    model: PointRCNN,
    params,
    loader: KittiPointRCNNLoader,
    cfg: PointRCNNConfig,
    out_dir: Optional[str] = None,
    class_name: str = "car",
    recall_thresholds: Sequence[float] = (0.1, 0.3, 0.5, 0.7),
    verbose: bool = False,
):
    """Joint eval: REFINED boxes (RCNN regression decoded into the lidar
    frame) scored by the RCNN head, final rotated NMS → KITTI label files +
    frames for the AP evaluator, with recall@IoU stats
    (eval_rcnn.py:117-694: decode_bbox_target on rcnn_reg, then NMS)."""
    from lyft3d_tpu.ops.nms import rotated_nms

    calib_cache: Dict[str, Calibration] = {}
    gt_frames, det_frames = [], []

    @jax.jit
    def infer(xyz, valid):
        out = model.apply(params, xyz, None, valid)
        refined = out["refined"]
        score = jax.nn.sigmoid(out["rcnn"]["cls"])
        ok = out["proposals"]["roi_valid"] & ~out["roi_empty"]
        score = jnp.where(ok, score, 0.0)
        bev = jnp.concatenate(
            [refined[:, 0:2], refined[:, 3:5], refined[:, 6:7]], -1
        )
        keep = rotated_nms(bev, score, cfg.final_nms_iou, valid=ok)
        return refined, jnp.where(keep, score, 0.0)

    for stem in loader.stems:
        s = loader.sample(stem)
        boxes, scores = jax.device_get(
            infer(jnp.asarray(s["points"]), jnp.asarray(s["points_valid"]))
        )
        roi_valid = scores > 0.0

        det_frames.append(
            {
                "boxes": boxes,
                "names": np.asarray([class_name] * len(boxes)),
                "scores": scores,
            }
        )
        g = s["gt_boxes"][s["gt_valid"]]
        gt_frames.append(
            {
                "boxes": g,
                "names": np.asarray([class_name] * len(g)),
                "difficulty": np.zeros(len(g), np.int64),
            }
        )
        if out_dir is not None:
            calib = calib_cache.setdefault(
                stem, Calibration.from_file(loader.root / "calib" / f"{stem}.txt")
            )
            objs = []
            for i in range(len(boxes)):
                if not roi_valid[i] or scores[i] <= 0.01:
                    continue
                pos, ry = box_lidar_to_camera(np.asarray(boxes[i], np.float64), calib)
                objs.append(
                    Object3d(
                        cls_type=class_name.capitalize(), truncation=0.0, occlusion=0,
                        alpha=0.0, box2d=np.array([0.0, 0.0, 50.0, 50.0]),
                        h=float(boxes[i][5]), w=float(boxes[i][3]), l=float(boxes[i][4]),
                        pos=pos, ry=ry, score=float(scores[i]),
                    )
                )
            Path(out_dir).mkdir(parents=True, exist_ok=True)
            write_label_file(Path(out_dir) / f"{stem}.txt", objs)
    from lyft3d_tpu.eval.kitti_eval import recall_at

    # Recall-by-threshold table, always computed and returned (the
    # reference's per-eval recall stats, eval_rcnn.py:440-463).
    stats = {
        f"recall@{t}": round(recall_at(gt_frames, det_frames, class_name, t), 4)
        for t in recall_thresholds
    }
    stats["num_frames"] = len(gt_frames)
    stats["num_gt"] = int(sum(len(g["boxes"]) for g in gt_frames))
    if verbose:
        print(f"eval {class_name}: {stats}")
    return gt_frames, det_frames, stats


def cache_rcnn_samples(rpn_model, rpn_params, loader: KittiPointRCNNLoader,
                       cfg: PointRCNNConfig, stems: Optional[Sequence[str]] = None):
    """Stage-1 output cache for offline RCNN training (the reference's
    ``rcnn_offline`` mode: eval_rcnn/train_rcnn with --rcnn_training_roi_dir,
    kitti_rcnn_dataset.py:918+): frozen-RPN proposals + per-point features
    per frame."""
    import jax.numpy as jnp

    from lyft3d_tpu.models.pointrcnn.net import proposal_layer

    @jax.jit
    def run_rpn(xyz, valid):
        feats = jnp.zeros((xyz.shape[0], 1), xyz.dtype)
        out = rpn_model.apply(rpn_params, xyz, feats, valid)
        props = proposal_layer(xyz, out["cls"], out["reg"], valid, cfg)
        return out["point_features"], props

    cache = []
    for stem in stems or loader.stems:
        s = loader.sample(stem)
        feats, props = jax.device_get(
            run_rpn(jnp.asarray(s["points"]), jnp.asarray(s["points_valid"]))
        )
        cache.append(
            {
                "stem": stem,
                "xyz": s["points"],
                "points_valid": s["points_valid"],
                "point_features": feats,
                "rois": props["rois"],
                "roi_valid": props["roi_valid"],
                "gt_boxes": s["gt_boxes"],
                "gt_valid": s["gt_valid"],
            }
        )
    return cache


def train_rcnn_offline(cache, cfg: PointRCNNConfig, steps: int = 100,
                       lr: float = 1e-3, seed: int = 0,
                       batch_size: int = 1,
                       n_devices: Optional[int] = None):
    """Offline RCNN training over cached stage-1 samples (train_mode
    rcnn_offline, train_rcnn.py:177-190): RoI-pool cached features, canonical
    transform, RCNN heads + proposal-target losses.

    ``batch_size`` cached frames train per step (vmapped); ``n_devices`` > 1
    shards the frame axis over a data-parallel mesh — DP parity with the
    reference's ``--mgpus`` DataParallel for the rcnn_offline mode
    (train_rcnn.py:252-253), matching ``train_rcnn_online``'s wiring."""
    import optax

    from lyft3d_tpu.models.pointrcnn.net import (
        PointRCNN_RCNN,
        canonical_transform,
        proposal_target_layer,
        rcnn_loss,
    )
    from lyft3d_tpu.ops.pointnet2 import roi_pool3d

    model = PointRCNN_RCNN(cfg)

    mesh = None
    if n_devices is not None and n_devices > 1:
        from lyft3d_tpu.parallel.mesh import make_data_mesh, replicate

        mesh = make_data_mesh(batch_size, n_devices)

    def roi_inputs_one(xyz, point_features, points_valid, rois):
        pooled, counts, empty = roi_pool3d(
            xyz, point_features, points_valid, rois,
            num_sampled=cfg.roi_points,
            extra_width=cfg.roi_extra_width,
        )
        canon = canonical_transform(pooled[..., :3], rois)
        return jnp.concatenate([canon, pooled[..., 3:]], axis=-1), counts

    def roi_inputs(sample):
        return roi_inputs_one(
            jnp.asarray(sample["xyz"]),
            jnp.asarray(sample["point_features"]),
            jnp.asarray(sample["points_valid"]),
            jnp.asarray(sample["rois"]),
        )

    pts0, counts0 = roi_inputs(cache[0])
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), pts0, counts0)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    if mesh is not None:
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)

    @jax.jit
    def step(params, opt_state, batch):
        def lf(p):
            def one(xyz, pf, pv, rois, roi_valid, gt, gt_valid):
                roi_pts, counts = roi_inputs_one(xyz, pf, pv, rois)
                tgts = proposal_target_layer(
                    rois, roi_valid, gt, gt_valid, cfg, jax.random.PRNGKey(0)
                )
                out = model.apply(p, roi_pts, counts)
                return rcnn_loss(out, rois, tgts, gt, cfg)

            losses, metrics = jax.vmap(one)(
                batch["xyz"], batch["point_features"],
                batch["points_valid"], batch["rois"], batch["roi_valid"],
                batch["gt_boxes"], batch["gt_valid"],
            )
            return jnp.mean(losses), jax.tree_util.tree_map(
                jnp.mean, metrics
            )

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    keys = ("xyz", "point_features", "points_valid", "rois", "roi_valid",
            "gt_boxes", "gt_valid")
    rng = np.random.RandomState(seed)
    losses = []
    for i in range(steps):
        picks = [cache[rng.randint(len(cache))] for _ in range(batch_size)]
        batch = {k: np.stack([np.asarray(s[k]) for s in picks]) for k in keys}
        if mesh is not None:
            from lyft3d_tpu.parallel.mesh import shard_batch

            batch = shard_batch(mesh, batch)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    return model, params, losses


def train_rcnn_online(
    rpn_model,
    rpn_params,
    loader: KittiPointRCNNLoader,
    cfg: PointRCNNConfig,
    steps: int = 100,
    lr: float = 1e-3,
    seed: int = 0,
    roi_noise: bool = True,
    batch_size: int = 1,
    n_devices: Optional[int] = None,
):
    """ONLINE ``rcnn`` train mode (train_rcnn.py:177-190, RPN.FIXED): the
    frozen RPN runs every step, proposals are generated live, optionally
    perturbed by RoI noise, then the RCNN trains on RoI-pooled live
    features. Only RCNN parameters receive gradients.

    ``batch_size`` frames are processed per step (vmapped stage-1 + loss);
    with ``n_devices`` > 1 the frame axis is sharded over a data-parallel
    mesh (reference ``--mgpus`` DataParallel parity, train_rcnn.py:252-253).

    Returns (rcnn_model, rcnn_params, losses).
    """
    import optax

    from lyft3d_tpu.models.pointrcnn.net import (
        PointRCNN_RCNN,
        aug_rois_with_noise,
        canonical_transform,
        proposal_layer,
        proposal_target_layer,
        rcnn_loss,
    )
    from lyft3d_tpu.ops.pointnet2 import roi_pool3d

    rcnn = PointRCNN_RCNN(cfg)

    mesh = None
    if n_devices is not None and n_devices > 1:
        from lyft3d_tpu.parallel.mesh import make_data_mesh

        mesh = make_data_mesh(batch_size, n_devices)

    def stage1_one(xyz, valid, gt, gt_valid, key):
        """Frozen RPN → proposals (+ optional noise) → pooled RoI points."""
        feats = jnp.zeros((xyz.shape[0], 1), xyz.dtype)
        out = rpn_model.apply(rpn_params, xyz, feats, valid)
        props = proposal_layer(xyz, out["cls"], out["reg"], valid, cfg)
        rois = props["rois"]
        k_noise, k_tgt = jax.random.split(key)
        # Reference order (sample_rois_for_rcnn): assign + sample first,
        # then IoU-controlled noise on the kept RoIs vs their assigned GT
        # (fg: up to roi_fg_aug_times attempts; bg: one).
        tgts = proposal_target_layer(
            rois, props["roi_valid"], gt, gt_valid, cfg, k_tgt
        )
        if roi_noise:
            rois = aug_rois_with_noise(
                rois, k_noise, gt_of_rois=gt[tgts["assigned_gt"]],
                fg=tgts["fg"], pos_iou=cfg.fg_iou,
                attempts=cfg.roi_fg_aug_times,
            )
        pooled, counts, empty = roi_pool3d(
            xyz, out["point_features"], valid, rois,
            num_sampled=cfg.roi_points, extra_width=cfg.roi_extra_width,
        )
        canon = canonical_transform(pooled[..., :3], rois)
        roi_pts = jnp.concatenate([canon, pooled[..., 3:]], axis=-1)
        return roi_pts, counts, rois, tgts

    stage1 = jax.jit(stage1_one)

    b0 = loader.sample(loader.stems[0])
    pts0, counts0, _, _ = stage1(
        jnp.asarray(b0["points"]), jnp.asarray(b0["points_valid"]),
        jnp.asarray(b0["gt_boxes"]), jnp.asarray(b0["gt_valid"]),
        jax.random.PRNGKey(0),
    )
    params = jax.jit(rcnn.init)(jax.random.PRNGKey(seed), pts0, counts0)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    # Frame-batched variants: stage-1 and the loss vmap over a leading
    # frame axis so a (sharded) multi-frame step is one program.
    stage1_batch = jax.jit(jax.vmap(stage1_one))

    @jax.jit
    def step(params, opt_state, roi_pts, counts, rois, tgts, gt):
        def lf(p):
            def one(rp, cn, ro, tg, g):
                out = rcnn.apply(p, rp, cn)
                return rcnn_loss(out, ro, tg, g, cfg)

            losses, metrics = jax.vmap(one)(roi_pts, counts, rois, tgts, gt)
            return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, metrics)

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    # Deterministic pick schedule → parallel sample assembly on prefetch
    # threads (the reference's DataLoader workers, train_rcnn.py:80-105).
    picks = [
        [loader.stems[rng.randint(len(loader.stems))] for _ in range(batch_size)]
        for _ in range(steps)
    ]

    from lyft3d_tpu.data.prefetch import MappedPrefetcher

    batches = MappedPrefetcher(lambda: iter(picks), loader.batch,
                               num_workers=4)
    losses = []
    for i, b in enumerate(batches):
        if mesh is not None:
            from lyft3d_tpu.parallel.mesh import shard_batch

            b = shard_batch(mesh, b)
        gt = jnp.asarray(b["gt_boxes"])
        keys = jax.random.split(
            jax.random.PRNGKey(seed * 7919 + i), batch_size
        )
        roi_pts, counts, rois, tgts = stage1_batch(
            jnp.asarray(b["points"]), jnp.asarray(b["points_valid"]),
            gt, jnp.asarray(b["gt_valid"]), keys,
        )
        params, opt_state, loss = step(
            params, opt_state, roi_pts, counts, rois, tgts, gt
        )
        losses.append(float(loss))
    return rcnn, params, losses


def assemble_joint_params(joint_model: PointRCNN, rpn_params, rcnn_params,
                          example):
    """Merge separately-trained stage params into the joint net's tree
    (the reference's eval loads --rpn_ckpt + --rcnn_ckpt, eval_rcnn.py:707).

    ``example`` = (xyz, valid) arrays for shape-only init.
    """
    xyz, valid = example
    params = jax.jit(joint_model.init)(jax.random.PRNGKey(0), xyz, None, valid)
    merged = dict(params["params"])
    merged["PointRCNN_RPN_0"] = rpn_params["params"]
    merged["PointRCNN_RCNN_0"] = rcnn_params["params"]
    return {"params": merged}
