"""Fused subm-conv pallas kernel == gather_by_rank + einsum (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lyft3d_tpu.ops.sparse_conv import (
    ActiveSet,
    build_hash,
    gather_by_rank,
    kernel_offsets,
    subm_neighbors,
)
from lyft3d_tpu.ops.subm_conv_kernel import subm_conv_pallas


def _setup(n_real=50, n_pad=14, c=8, cout=16, seed=0, shape=(8, 8, 4)):
    rng = np.random.RandomState(seed)
    flat = rng.choice(shape[0] * shape[1] * shape[2], n_real, replace=False)
    coords = np.zeros((n_real + n_pad, 3), np.int32)
    coords[:n_real, 0] = flat % shape[0]
    coords[:n_real, 1] = (flat // shape[0]) % shape[1]
    coords[:n_real, 2] = flat // (shape[0] * shape[1])
    valid = np.arange(n_real + n_pad) < n_real
    active = ActiveSet(jnp.asarray(coords), jnp.asarray(valid), shape)
    feats = jnp.asarray(
        rng.randn(n_real + n_pad, c).astype(np.float32) * valid[:, None]
    )
    w = jnp.asarray(rng.randn(27, c, cout).astype(np.float32))
    return active, feats, w


class TestFusedSubmConv:
    @pytest.mark.parametrize("tile", [16, 64])
    def test_matches_gather_einsum(self, tile):
        active, feats, w = _setup()
        hash_ = build_hash(active)
        ranks = subm_neighbors(active, hash_, kernel_offsets(3))
        f_sorted = feats[hash_[1]]

        ref = jnp.einsum(
            "kvc,kcd->vd", gather_by_rank(feats, hash_[1], ranks), w
        )
        got = subm_conv_pallas(f_sorted, ranks, w, tile=tile, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_all_absent_rows_zero(self):
        active, feats, w = _setup(n_real=4, n_pad=4)
        hash_ = build_hash(active)
        ranks = jnp.full((27, 8), -1, jnp.int32)
        out = subm_conv_pallas(feats[hash_[1]], ranks, w, tile=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_vjp_matches_xla_grads(self):
        active, feats, w = _setup(n_real=30, n_pad=10, c=4, cout=4)
        hash_ = build_hash(active)
        ranks = subm_neighbors(active, hash_, kernel_offsets(3))
        f_sorted = feats[hash_[1]]

        def loss_fused(f, ww):
            return jnp.sum(
                subm_conv_pallas(f, ranks, ww, tile=16, interpret=True) ** 2
            )

        def loss_ref(f, ww):
            ok = ranks >= 0
            safe = jnp.clip(ranks, 0, f.shape[0] - 1)
            gathered = f[safe] * ok[..., None].astype(f.dtype)
            return jnp.sum(jnp.einsum("kvc,kcd->vd", gathered, ww) ** 2)

        gf1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(f_sorted, w)
        gf2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(f_sorted, w)
        np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=1e-3, atol=1e-3)
