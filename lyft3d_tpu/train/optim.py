"""Optimizers and LR schedules (optax).

Capability of the reference's four duplicated optimizer stacks
(``ranger.py`` = RAdam+Lookahead, ``Radam.py``, fastai ``OptimWrapper`` with
true weight decay + layer groups, ``OneCycle``/``LRSchedulerStep`` —
duplicated in unet_baseline/, deeplab_v3_baseline/tuils/, PointRCNN/tools/
train_utils/, second/torchplus/train/): one optax implementation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["ranger", "radam", "lookahead", "one_cycle", "cosine_warm_restarts",
           "adam_one_cycle", "build_optimizer"]


def radam(learning_rate, b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5,
          weight_decay: float = 0.0):
    """Rectified Adam (Radam.py:5 semantics; optax core implementation)."""
    tx = optax.radam(learning_rate, b1=b1, b2=b2, eps=eps)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    step: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (ranger.py's k/alpha loop) as a single
    GradientTransformation — slow weights live in the optimizer state, so the
    train-state pytree stays a plain params tree (unlike optax.lookahead's
    LookaheadParams wrapper)."""

    def init(params):
        # Copy (not alias) the params: aliased buffers break jit donation.
        return LookaheadState(
            inner=inner.init(params),
            slow=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
            step=jnp.zeros([], jnp.int32),
        )

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        inner_updates, inner_state = inner.update(updates, state.inner, params)
        fast = optax.apply_updates(params, inner_updates)
        step = state.step + 1
        sync = (step % sync_period) == 0

        def synced(fast, slow):
            new_slow = jax.tree_util.tree_map(
                lambda s, f: s + slow_step * (f - s), slow, fast
            )
            return new_slow, new_slow

        def not_synced(fast, slow):
            return fast, slow

        new_params, new_slow = jax.lax.cond(sync, synced, not_synced, fast, state.slow)
        final_updates = jax.tree_util.tree_map(lambda n, p: n - p, new_params, params)
        return final_updates, LookaheadState(inner_state, new_slow, step)

    return optax.GradientTransformation(init, update)


def ranger(learning_rate, sync_period: int = 6, slow_step: float = 0.5,
           b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5,
           weight_decay: float = 0.0):
    """Ranger = RAdam + Lookahead (ranger.py:14)."""
    return lookahead(
        radam(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay),
        sync_period=sync_period,
        slow_step=slow_step,
    )


def one_cycle(lr_max: float, total_steps: int, pct_start: float = 0.4,
              div_factor: float = 10.0, final_div: float = 1e4):
    """fastai OneCycle LR schedule (learning_schedules_fastai.py:56):
    cosine warmup lr_max/div → lr_max over pct_start, cosine anneal to
    lr_max/final_div."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=lr_max,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div,
    )


def one_cycle_momentum(total_steps: int, pct_start: float = 0.4,
                       moms=(0.95, 0.85)):
    """The paired momentum schedule (high→low→high) of fastai OneCycle."""
    up, down = moms
    warm = optax.cosine_decay_schedule(init_value=up, decay_steps=max(int(total_steps * pct_start), 1),
                                       alpha=down / up)
    anneal = optax.cosine_decay_schedule(init_value=down, decay_steps=max(total_steps - int(total_steps * pct_start), 1),
                                         alpha=up / down)
    return optax.join_schedules([warm, anneal], [int(total_steps * pct_start)])


def cosine_warm_restarts(lr_max: float, period: int, t_mult: int = 1, cycles: int = 8,
                         min_scale: float = 0.0):
    """WarmRestart cosine schedule (deeplab tuils/lrs_scheduler.py:23)."""
    schedules, boundaries, t, acc = [], [], period, 0
    for _ in range(cycles):
        schedules.append(
            optax.cosine_decay_schedule(init_value=lr_max, decay_steps=t, alpha=min_scale)
        )
        acc += t
        boundaries.append(acc)
        t *= t_mult
    return optax.join_schedules(schedules, boundaries[:-1])


def adam_one_cycle(lr_max: float, total_steps: int, weight_decay: float = 1e-2,
                   pct_start: float = 0.4, clip_norm: Optional[float] = None):
    """The reference's ``adam_onecycle`` config (fastai OptimWrapper with true
    weight decay + OneCycle lr & momentum; train_rcnn.py:108-139)."""
    lr = one_cycle(lr_max, total_steps, pct_start)
    mom = one_cycle_momentum(total_steps, pct_start)
    tx = optax.inject_hyperparams(
        lambda learning_rate, b1: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=b1, b2=0.99),
            optax.scale_by_learning_rate(learning_rate),
        )
    )(learning_rate=lr, b1=mom)
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def build_optimizer(name: str, lr, total_steps: int = 0, weight_decay: float = 0.0,
                    clip_norm: Optional[float] = None, grad_accum: int = 1,
                    **kwargs):
    """Config-driven construction (the optimizer switch in
    unet-training-with-map.py:293-306 / optimizer_builder.py:38)."""
    if name == "ranger":
        tx = ranger(lr, weight_decay=weight_decay, **kwargs)
    elif name == "radam":
        tx = radam(lr, weight_decay=weight_decay, **kwargs)
    elif name == "adam":
        tx = optax.adam(lr, **kwargs)
    elif name == "adamw":
        tx = optax.adamw(lr, weight_decay=weight_decay, **kwargs)
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=kwargs.pop("momentum", 0.9), **kwargs)
    elif name == "adam_onecycle":
        tx = adam_one_cycle(lr, total_steps, weight_decay=weight_decay, **kwargs)
    else:
        raise KeyError(name)
    if clip_norm and name != "adam_onecycle":
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx
