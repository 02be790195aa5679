"""BEV segmentation training driver.

Capability of ``unet_baseline/unet-training-with-map.py:223-425`` and
``deeplab_v3_baseline/deeplab_training_with_map.py:130-314``: 80/20 token
split, PNG dataset with augmentation, weighted-CE + SIZE·BCE + SoftDice
objective, Ranger/one-cycle (or any registered optimizer), gradient
accumulation, clip-norm, best-val checkpointing — on the shared Trainer
with pjit data parallelism.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.config import BEVExperiment, snapshot_config
from lyft3d_tpu.data.bev_dataset import BEVImageDataset, batch_iterator
from lyft3d_tpu.models import build_model
from lyft3d_tpu.parallel.mesh import make_data_mesh, replicate
from lyft3d_tpu.train.losses import bev_segmentation_loss
from lyft3d_tpu.train.optim import build_optimizer
from lyft3d_tpu.train.trainer import Trainer, TrainerConfig


def train_bev(
    cfg: BEVExperiment,
    bev_dir,
    tokens=None,
    n_devices: Optional[int] = None,
    log_every: int = 50,
    eval_every: int = 500,
    num_workers: int = 4,
    dtype=jnp.bfloat16,
):
    """Train a BEV segmentation model from a generated PNG dataset."""
    bev_dir = Path(bev_dir)
    if tokens is None:
        tokens = sorted({p.name.rsplit("_", 1)[0] for p in bev_dir.glob("*_input.png")})
    rng = np.random.RandomState(cfg.data.seed)
    perm = rng.permutation(len(tokens))
    n_val = max(int(len(tokens) * 0.2), 1)
    train_tokens = [tokens[i] for i in perm[n_val:]]
    val_tokens = [tokens[i] for i in perm[:n_val]]

    train_ds = BEVImageDataset(bev_dir, train_tokens, with_map=cfg.with_map, augment=True)
    val_ds = BEVImageDataset(bev_dir, val_tokens, with_map=cfg.with_map, augment=False)

    model = build_model(cfg.model, n_classes=cfg.n_classes, dtype=dtype, **cfg.model_kwargs)
    in_ch = 6 if cfg.with_map else 3
    h, w, _ = cfg.bev_shape
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.data.seed), jnp.zeros((1, h, w, in_ch), jnp.float32)
    )
    if cfg.init_from:
        from lyft3d_tpu.train import checkpoint as ckpt

        if ckpt.latest_checkpoint(cfg.init_from, name=cfg.model) is None:
            raise FileNotFoundError(
                f"init_from={cfg.init_from!r} has no {cfg.model!r} checkpoint"
            )
        donor, _ = ckpt.restore_latest(cfg.init_from, params, name=cfg.model)
        params = ckpt.partial_restore(params, donor, verbose=True)

    opt = cfg.optimizer
    tx = build_optimizer(
        opt.name, opt.lr, total_steps=opt.total_steps, weight_decay=opt.weight_decay,
        clip_norm=opt.clip_norm, grad_accum=opt.grad_accum,
    )
    has_bn = "batch_stats" in params
    if has_bn:
        import optax

        # BatchNorm models: the optimizer must not touch the running stats
        # (zero grads, but weight decay would still shrink them); the train
        # step refreshes them via the _model_state convention instead.
        mask = {
            "params": jax.tree_util.tree_map(lambda _: True, params["params"]),
            "batch_stats": jax.tree_util.tree_map(
                lambda _: False, params["batch_stats"]
            ),
        }
        tx = optax.masked(tx, mask)
    class_weights = jnp.asarray(cfg.class_weights)

    def loss_fn(model, params, batch, rng):
        if has_bn:
            (logits, aux), new_state = model.apply(
                params, batch["image"], mutable=["batch_stats"]
            )
        else:
            logits, aux = model.apply(params, batch["image"])
        total, comps = bev_segmentation_loss(
            logits, aux, batch["label"], class_weights, cfg.size_weight
        )
        if has_bn:
            comps = dict(
                comps,
                _model_state=jax.lax.stop_gradient(new_state["batch_stats"]),
            )
        return total, comps

    mesh = make_data_mesh(cfg.batch_size, n_devices)

    @jax.jit
    def _eval_one(params, x, y):
        logits, aux = model.apply(params, x)
        total, _ = bev_segmentation_loss(logits, aux, y, class_weights, cfg.size_weight)
        return total

    def eval_fn(state):
        losses = []
        for i in range(len(val_ds)):
            x, y = val_ds.load(i)
            losses.append(float(_eval_one(state.params, jnp.asarray(x[None]),
                                          jnp.asarray(y[None]))))
        return {"loss": float(np.mean(losses))}

    tcfg = TrainerConfig(
        model_dir=cfg.model_dir,
        total_steps=opt.total_steps,
        log_every=log_every,
        eval_every=eval_every,
        ckpt_every=eval_every,
    )
    snapshot_config(cfg, cfg.model_dir)
    trainer = Trainer(model, tx, loss_fn, tcfg, mesh=mesh, eval_fn=eval_fn)
    state = trainer.init_or_resume(replicate(mesh, params))
    from lyft3d_tpu.data.bev_dataset import index_batches
    from lyft3d_tpu.data.prefetch import MappedPrefetcher

    # Work items are cheap index chunks; imread + augmentation runs on
    # parallel workers (the reference's DataLoader num_workers).
    batches = MappedPrefetcher(
        lambda: index_batches(
            len(train_ds), cfg.batch_size, steps=opt.total_steps, seed=cfg.data.seed
        ),
        lambda take: train_ds.assemble(take),
        num_workers=num_workers,
        depth=4,
    )
    state = trainer.fit(state, iter(batches))
    return state, model
