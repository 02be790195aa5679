"""Training-harness tests: losses, Ranger/one-cycle, checkpoint manager,
running metrics, and an overfit-a-tiny-batch learning test with 8-device DP."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lyft3d_tpu.models import build_model
from lyft3d_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from lyft3d_tpu.train import checkpoint as ckpt
from lyft3d_tpu.train.losses import (
    bev_segmentation_loss,
    sigmoid_focal_loss,
    soft_dice_loss,
    weighted_smooth_l1,
    weighted_softmax_ce,
)
from lyft3d_tpu.train.logging import MetricLog, flatten_metrics
from lyft3d_tpu.train.metrics import (
    accuracy_compute,
    accuracy_init,
    accuracy_update,
    prec_recall_compute,
    prec_recall_init,
    prec_recall_update,
)
from lyft3d_tpu.train.optim import (
    adam_one_cycle,
    build_optimizer,
    one_cycle,
    ranger,
)
from lyft3d_tpu.train.trainer import Trainer, TrainerConfig, TrainState


class TestLosses:
    def test_weighted_ce_uniform_logits(self):
        logits = jnp.zeros((4, 8, 3))
        labels = jnp.zeros((4, 8), jnp.int32)
        ce = weighted_softmax_ce(logits, labels)
        np.testing.assert_allclose(float(ce), np.log(3), rtol=1e-6)

    def test_class_weights_reweight(self):
        logits = jnp.array([[10.0, 0.0], [0.0, 10.0]])  # both correct
        labels = jnp.array([0, 1])
        w_eq = weighted_softmax_ce(logits, labels, jnp.array([1.0, 1.0]))
        w_skew = weighted_softmax_ce(logits, labels, jnp.array([0.0, 1.0]))
        assert float(w_skew) >= 0 and abs(float(w_eq) - float(w_skew)) < 1e-4

    def test_dice_perfect_prediction(self):
        onehot = jax.nn.one_hot(jnp.array([[1, 2], [0, 1]]), 3)
        logits = (onehot * 2 - 1) * 20.0  # saturate sigmoid at 0/1
        assert float(soft_dice_loss(logits, onehot)) < 0.01

    def test_focal_downweights_easy(self):
        easy = sigmoid_focal_loss(jnp.array([10.0]), jnp.array([1.0]))[0]
        hard = sigmoid_focal_loss(jnp.array([-10.0]), jnp.array([1.0]))[0]
        assert float(hard) > 100 * float(easy)

    def test_smooth_l1_regimes(self):
        small = weighted_smooth_l1(jnp.array([[0.01]]), jnp.array([[0.0]]))[0]
        large = weighted_smooth_l1(jnp.array([[5.0]]), jnp.array([[0.0]]))[0]
        np.testing.assert_allclose(float(small), 0.5 * 9 * 1e-4, rtol=1e-4)
        np.testing.assert_allclose(float(large), 5.0 - 0.5 / 9, rtol=1e-5)

    def test_bev_loss_components(self):
        logits = jnp.zeros((2, 8, 8, 4))
        aux = jnp.zeros((2, 4))
        labels = jnp.zeros((2, 8, 8), jnp.int32)
        total, comps = bev_segmentation_loss(logits, aux, labels, size_weight=8.0)
        assert set(comps) == {"ce", "bce", "dice", "aux"}
        assert float(total) > 0


def _quadratic_losses(tx, steps=60):
    params = {"w": jnp.array([3.0, -2.0])}
    opt_state = tx.init(params)

    def loss(p):
        return jnp.sum(p["w"] ** 2)

    for _ in range(steps):
        g = jax.grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
    return float(loss(params))


class TestOptim:
    def test_ranger_optimizes(self):
        assert _quadratic_losses(ranger(0.2), steps=200) < 0.05

    def test_adam_onecycle_optimizes(self):
        assert _quadratic_losses(adam_one_cycle(0.3, total_steps=60)) < 0.3

    def test_one_cycle_shape(self):
        sched = one_cycle(1.0, 100, pct_start=0.3)
        lrs = [float(sched(i)) for i in range(100)]
        assert abs(max(lrs) - 1.0) < 1e-6
        assert np.argmax(lrs) == pytest.approx(30, abs=2)
        assert lrs[0] < 0.2 and lrs[-1] < 0.01

    def test_build_optimizer_names(self):
        for name in ("ranger", "radam", "adam", "adamw", "sgd", "adam_onecycle"):
            tx = build_optimizer(name, 1e-3, total_steps=10)
            params = {"w": jnp.ones(3)}
            tx.init(params)

    def test_grad_accum(self):
        tx = build_optimizer("adam", 1e-2, grad_accum=4)
        params = {"w": jnp.array(1.0)}
        st = tx.init(params)
        for i in range(3):  # first 3 micro-steps: no update
            up, st = tx.update({"w": jnp.array(1.0)}, st, params)
            assert float(up["w"]) == 0.0
        up, st = tx.update({"w": jnp.array(1.0)}, st, params)
        assert float(up["w"]) != 0.0


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.array(7)}
        ckpt.save(tmp_path, state, global_step=7)
        back, step = ckpt.restore_latest(tmp_path, state)
        assert step == 7
        np.testing.assert_array_equal(np.asarray(back["params"]["w"]), [0, 1, 2, 3])

    def test_max_to_keep(self, tmp_path):
        state = {"w": jnp.zeros(2)}
        for s in range(5):
            ckpt.save(tmp_path, state, global_step=s, max_to_keep=2)
        files = sorted(p.name for p in tmp_path.glob("*.ckpt"))
        assert files == ["model-3.ckpt", "model-4.ckpt"]
        assert ckpt.latest_checkpoint(tmp_path).name == "model-4.ckpt"

    def test_restore_latest_none(self, tmp_path):
        state = {"w": jnp.zeros(2)}
        back, step = ckpt.restore_latest(tmp_path, state)
        assert step is None

    def test_repeat_eval_checkpoints(self, tmp_path):
        """Checkpoint-watching repeat eval (repeat_eval_ckpt,
        eval_rcnn.py:793): every registered ckpt evaluated once, in step
        order; the persisted record makes a second watch skip them."""
        state = {"w": jnp.zeros(2)}
        for s in (10, 20):
            ckpt.save(tmp_path, state, global_step=s)
        seen = []
        out = ckpt.repeat_eval_checkpoints(
            tmp_path, lambda path, step: seen.append(step) or step * 2,
            poll_interval=0.01, max_idle_polls=2,
        )
        assert seen == [10, 20]
        assert out == {10: 20, 20: 40}
        # New ckpt appears: only it is evaluated on the next watch.
        ckpt.save(tmp_path, state, global_step=30)
        seen2 = []
        out2 = ckpt.repeat_eval_checkpoints(
            tmp_path, lambda path, step: seen2.append(step) or step,
            poll_interval=0.01, max_idle_polls=2,
        )
        assert seen2 == [30] and out2 == {30: 30}

    def test_partial_restore(self):
        params = {"a": jnp.zeros(3), "b": jnp.zeros(2), "head": jnp.zeros(5)}
        donor = {"a": jnp.ones(3), "b": jnp.ones(4), "head": jnp.ones(5)}
        out = ckpt.partial_restore(params, donor, exclude="head")
        np.testing.assert_array_equal(np.asarray(out["a"]), 1.0)  # copied
        np.testing.assert_array_equal(np.asarray(out["b"]), 0.0)  # shape mismatch
        np.testing.assert_array_equal(np.asarray(out["head"]), 0.0)  # excluded


class TestMetrics:
    def test_precision_recall(self):
        st = prec_recall_init([0.5])
        scores = jnp.array([0.9, 0.8, 0.2, 0.6])
        labels = jnp.array([1, 0, 1, 1])
        st = prec_recall_update(st, scores, labels)
        prec, rec = prec_recall_compute(st)
        np.testing.assert_allclose(np.asarray(prec), [2 / 3], atol=1e-6)
        np.testing.assert_allclose(np.asarray(rec), [2 / 3], atol=1e-6)

    def test_accuracy_accumulates(self):
        st = accuracy_init()
        st = accuracy_update(st, jnp.array([1, 0]), jnp.array([1, 1]))
        st = accuracy_update(st, jnp.array([1]), jnp.array([1]))
        np.testing.assert_allclose(float(accuracy_compute(st)), 2 / 3)

    def test_flatten_metrics(self):
        flat = flatten_metrics({"a": {"b": 1.0, "c": {"d": 2}}, "e": 3.0})
        assert flat == {"a.b": 1.0, "a.c.d": 2.0, "e": 3.0}


class TestTrainerLearning:
    def test_overfit_tiny_batch_dp8(self, tmp_path):
        """UNet overfits one synthetic batch under 8-device data parallelism;
        loss must drop substantially — validates grads, optimizer, sharding."""
        rng = np.random.RandomState(0)
        x = rng.rand(8, 16, 16, 3).astype(np.float32)
        y = (rng.rand(8, 16, 16) * 3).astype(np.int32)
        batch = {"image": x, "label": y}

        model = build_model("unet_reference", n_classes=3, wf=3, depth=1, dtype=jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        tx = build_optimizer("adam", 3e-3)

        def loss_fn(model, params, batch, rng):
            logits, aux = model.apply(params, batch["image"])
            total, comps = bev_segmentation_loss(logits, aux, batch["label"], size_weight=4.0)
            return total, comps

        mesh = make_mesh(8)
        cfg = TrainerConfig(
            model_dir=str(tmp_path), total_steps=40, log_every=20,
            eval_every=0, ckpt_every=0, use_tensorboard=False,
        )
        trainer = Trainer(model, tx, loss_fn, cfg, mesh=mesh)
        state = trainer.init_or_resume(replicate(mesh, params))

        first = None
        sharded = shard_batch(mesh, batch)
        losses = []
        for _ in range(60):
            state, metrics = trainer._step_fn(state, sharded, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < 0.70 * losses[0], (losses[0], losses[-1])

    def test_fit_loop_checkpoints_and_resumes(self, tmp_path):
        model = build_model("unet_reference", n_classes=3, wf=3, depth=1, dtype=jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        tx = build_optimizer("adam", 1e-3)

        def loss_fn(model, params, batch, rng):
            logits, aux = model.apply(params, batch["image"])
            return jnp.mean(logits**2), {}

        cfg = TrainerConfig(
            model_dir=str(tmp_path), total_steps=6, log_every=2,
            eval_every=0, ckpt_every=3, use_tensorboard=False, donate_state=False,
        )
        mesh = make_mesh(1)
        trainer = Trainer(model, tx, loss_fn, cfg, mesh=mesh)
        state = trainer.init_or_resume(params)
        batch = {"image": np.zeros((2, 8, 8, 3), np.float32)}
        state = trainer.fit(state, iter([batch] * 10))
        assert int(state.step) == 6
        # New trainer resumes from the registry.
        trainer2 = Trainer(model, tx, loss_fn, cfg, mesh=mesh)
        state2 = trainer2.init_or_resume(params)
        assert int(state2.step) == 6
