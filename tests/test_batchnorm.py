"""BatchNorm option: mutable-stats training, fold-to-conv inference, and
FUNCTION-PRESERVING torch import (VERDICT r1 #6).

The reference's models run torch BatchNorm which folds into the preceding
conv at inference; these tests pin (a) the flax "batch" norm_type's train/
eval semantics, (b) fold_batch_norms' exactness, and (c) bitwise-level
agreement between a torch SE-ResNeXt forward and the flax backbone loaded
from its state_dict with norm_type="batch".
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from lyft3d_tpu.models import build_model
from lyft3d_tpu.models.fold_bn import fold_batch_norms


class TestBatchNormOption:
    def test_init_train_eval_semantics(self):
        model = build_model("unet_seresnext26", n_classes=4,
                            norm_type="batch", dtype=jnp.float32)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 6), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        assert "batch_stats" in variables

        # train-mode apply updates the running stats
        (logits, aux), new_state = model.apply(
            variables, x, mutable=["batch_stats"]
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(new_state["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(after, before)
        )
        # eval-mode apply is deterministic and uses running averages
        e1, _ = model.apply(variables, x)
        e2, _ = model.apply(variables, x)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    def test_fold_batch_norms_exact(self):
        bn_model = build_model("unet_seresnext26", n_classes=4,
                               norm_type="batch", dtype=jnp.float32)
        x = jnp.asarray(np.random.RandomState(1).randn(1, 64, 64, 6), jnp.float32)
        variables = jax.jit(bn_model.init)(jax.random.PRNGKey(1), x)
        # non-trivial running stats so the fold is actually exercised
        rng = np.random.RandomState(2)
        variables = jax.tree_util.tree_map(np.asarray, variables)

        def perturb(node):
            for k, v in node.items():
                if isinstance(v, dict):
                    perturb(v)
                elif k == "mean":
                    node[k] = rng.normal(0.1, 0.5, v.shape).astype(np.float32)
                elif k == "var":
                    node[k] = rng.uniform(0.5, 2.0, v.shape).astype(np.float32)

        perturb(variables["batch_stats"])

        ref, _ = bn_model.apply(variables, x)

        folded_model = build_model("unet_seresnext26", n_classes=4,
                                   norm_type="folded", dtype=jnp.float32)
        folded_vars = fold_batch_norms(variables)
        # structure must match the folded model's own init
        init_folded = jax.jit(folded_model.init)(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.shape, folded_vars)
        ) == jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.shape, init_folded)
        )
        out, _ = folded_model.apply(folded_vars, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def _torch_block_forward(blk, x):
    import torch.nn.functional as F

    y = F.relu(blk.bn1(blk.conv1(x)))
    y = F.relu(blk.bn2(blk.conv2(y)))
    y = blk.bn3(blk.conv3(y))
    s = y.mean((2, 3), keepdim=True)
    s = F.relu(blk.se_module.fc1(s))
    s = torch.sigmoid(blk.se_module.fc2(s))
    y = y * s
    sc = blk.downsample(x) if hasattr(blk, "downsample") else x
    return F.relu(y + sc)


def _torch_forward(net, x):
    import torch.nn.functional as F

    x = F.relu(net.layer0.bn1(net.layer0.conv1(x)))
    x = F.max_pool2d(x, 3, 2, 1)
    feats = []
    for li in range(1, 5):
        for blk in getattr(net, f"layer{li}"):
            x = _torch_block_forward(blk, x)
        feats.append(x)
    return feats


class TestTorchExactness:
    def test_backbone_forward_matches_torch(self):
        """Imported norm_type='batch' flax backbone == torch eval forward
        (all 4 stages) — the function-preserving import deliverable."""
        from tests.test_torch_import import _torch_seresnext26

        from lyft3d_tpu.models.backbones import build_backbone
        from lyft3d_tpu.utils.torch_import import (
            normalize_state_dict,
            seresnext_params_from_torch,
            split_batch_stats,
        )

        net = _torch_seresnext26(in_ch=3).eval()
        sd = normalize_state_dict(net.state_dict())
        tree = seresnext_params_from_torch(
            sd, stage_sizes=(2, 2, 2, 2), in_channels=3, norm_type="batch"
        )
        params, stats = split_batch_stats(tree)

        x = np.random.RandomState(3).randn(1, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            ref_feats = _torch_forward(net, torch.from_numpy(x))

        flax_bb = build_backbone("seresnext26", norm_type="batch",
                                 dtype=jnp.float32)
        variables = {"params": params, "batch_stats": stats}
        got_feats = flax_bb.apply(
            variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        )
        assert len(got_feats) == 4
        for stage, (ref, got) in enumerate(zip(ref_feats, got_feats)):
            ref_nhwc = np.transpose(ref.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(
                np.asarray(got), ref_nhwc, rtol=2e-4, atol=2e-4,
                err_msg=f"stage {stage}",
            )

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject)
