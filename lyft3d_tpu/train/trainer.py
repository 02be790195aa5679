"""Generic step-loop trainer: train-state pytree, pjit DP, checkpoints, logs.

One harness with the capabilities of all three reference trainer stacks:
- step-based loop with periodic eval + resilient checkpointing
  (``second/second/pytorch/train.py:137-464``);
- gradient accumulation, grad clipping, best-val tracking
  (``unet-training-with-map.py:353-425``);
- auto-resume from the model_dir registry (``train.py:160-162,190``),
  checkpoint-on-interrupt (``train.py:448-462``).

The model must be a flax module returning whatever the supplied ``loss_fn``
consumes: ``loss_fn(model, params, batch, rng) -> (loss, metrics_dict)``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from lyft3d_tpu.parallel.mesh import make_mesh, shard_batch
from lyft3d_tpu.train import checkpoint as ckpt
from lyft3d_tpu.train.logging import MetricLog


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


@dataclass
class TrainerConfig:
    model_dir: str = "/tmp/lyft3d_model"
    total_steps: int = 1000
    log_every: int = 50
    eval_every: int = 500
    ckpt_every: int = 500
    max_to_keep: int = 8
    ckpt_name: str = "model"
    use_tensorboard: bool = False
    donate_state: bool = True


class Trainer:
    def __init__(
        self,
        model,
        tx: optax.GradientTransformation,
        loss_fn: Callable,
        config: TrainerConfig,
        mesh=None,
        eval_fn: Optional[Callable] = None,
    ):
        self.model = model
        self.tx = tx
        self.loss_fn = loss_fn
        self.cfg = config
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.eval_fn = eval_fn
        self.log = MetricLog(config.model_dir, use_tensorboard=config.use_tensorboard)
        self._step_fn = self._build_step()
        self.best_val = float("inf")

    def _build_step(self):
        model, tx, loss_fn = self.model, self.tx, self.loss_fn

        def step_fn(state: TrainState, batch, rng):
            def wrapped(params):
                return loss_fn(model, params, batch, rng)

            (loss, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            # Mutable-collection convention: a loss_fn that runs BatchNorm
            # in train mode returns the refreshed running stats under this
            # reserved key; they replace the batch_stats subtree (the
            # optimizer is masked off it by the pipeline — see bev_train).
            new_model_state = metrics.pop("_model_state", None)
            if new_model_state is not None:
                params = dict(params, batch_stats=new_model_state)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return (
                TrainState(params=params, opt_state=opt_state, step=state.step + 1),
                metrics,
            )

        donate = (0,) if self.cfg.donate_state else ()
        return jax.jit(step_fn, donate_argnums=donate)

    # -- lifecycle -----------------------------------------------------------
    def init_or_resume(self, init_params) -> TrainState:
        state = TrainState.create(init_params, self.tx)
        restored, step = ckpt.restore_latest(
            self.cfg.model_dir, state, name=self.cfg.ckpt_name
        )
        if step is not None:
            self.log.log_text(f"resumed from step {step}", step)
            return restored
        return state

    def fit(self, state: TrainState, batches: Iterable, rng=None) -> TrainState:
        """Run the step loop over ``batches`` (host iterator of pytrees)."""
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        t0 = time.time()
        window = []
        try:
            for batch in batches:
                step = int(state.step)
                if step >= cfg.total_steps:
                    break
                rng, sub = jax.random.split(rng)
                batch = shard_batch(self.mesh, batch)
                state, metrics = self._step_fn(state, batch, sub)
                window.append(metrics)

                step = int(state.step)
                if step % cfg.log_every == 0:
                    m = jax.device_get(window[-1])
                    m["runtime/steptime"] = (time.time() - t0) / max(len(window), 1)
                    t0, window = time.time(), []
                    self.log.log_metrics({"train": m}, step)
                if cfg.eval_every and step % cfg.eval_every == 0 and self.eval_fn:
                    val = self.eval_fn(state)
                    self.log.log_metrics({"eval": val}, step)
                    vloss = float(val.get("loss", np.inf))
                    if vloss < self.best_val:
                        self.best_val = vloss
                        ckpt.save(
                            cfg.model_dir, jax.device_get(state), name="best",
                            global_step=step, max_to_keep=2,
                        )
                if cfg.ckpt_every and step % cfg.ckpt_every == 0:
                    ckpt.save(
                        cfg.model_dir, jax.device_get(state), name=cfg.ckpt_name,
                        global_step=step, max_to_keep=cfg.max_to_keep,
                    )
        except (KeyboardInterrupt, Exception):
            # Resilient checkpoint-on-failure (train.py:448-462), then re-raise.
            ckpt.save(
                cfg.model_dir, jax.device_get(state), name=cfg.ckpt_name,
                global_step=int(state.step), max_to_keep=cfg.max_to_keep,
            )
            self.log.log_text(f"interrupted at step {int(state.step)}; checkpoint saved")
            raise
        ckpt.save(
            cfg.model_dir, jax.device_get(state), name=cfg.ckpt_name,
            global_step=int(state.step), max_to_keep=cfg.max_to_keep,
        )
        return state
