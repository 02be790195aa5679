"""BEV-column (dense-z) sparse conv == per-voxel gather formulation.

The column middle (ops/column_sparse.py, models/second/middle.py
SparseMiddleColumns) is the TPU-fast re-formulation of the sparse stack;
these tests pin its math to the gather-einsum formulation (itself verified
against dense lax.conv in tests/test_sparse_conv.py) on data where the
capacity caps do not bind.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lyft3d_tpu.ops.column_sparse import (
    ColumnSet,
    column_neighbors,
    columns_from_voxels,
    columns_to_dense_bev,
    downsample_columns,
    strided_conv_columns,
    strided_conv_columns_batched,
    subm_conv_columns,
    subm_conv_columns_batched,
)
from lyft3d_tpu.ops.sparse_conv import (
    ActiveSet,
    build_hash,
    downsample_coords,
    gather_by_rank,
    kernel_offsets,
    sparse_conv3d_gather,
    subm_neighbors,
)


def random_active(rng, shape, n, cap=None):
    """Unique-coord active set, optionally padded to a larger capacity."""
    nx, ny, nz = shape
    flat = rng.choice(nx * ny * nz, n, replace=False)
    x = flat % nx
    y = (flat // nx) % ny
    z = flat // (nx * ny)
    coords = np.stack([x, y, z], -1).astype(np.int32)
    cap = cap or n
    pad = cap - n
    coords = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return ActiveSet(coords=jnp.asarray(coords), valid=jnp.asarray(valid),
                     spatial_shape=shape)


def voxel_lookup(colf, mask, cols, active):
    """Read back each active voxel's column feature as a (V, C) array."""
    col_ids = np.asarray(cols.col_ids)
    nx, _ = cols.bev_shape
    out = np.zeros((active.coords.shape[0], colf.shape[-1]), np.float32)
    coords = np.asarray(active.coords)
    valid = np.asarray(active.valid)
    for i in range(coords.shape[0]):
        if not valid[i]:
            continue
        bev = coords[i, 1] * nx + coords[i, 0]
        c = int(np.searchsorted(col_ids, bev))
        assert col_ids[c] == bev
        assert np.asarray(mask)[c, coords[i, 2]]
        out[i] = np.asarray(colf)[c, coords[i, 2]]
    return out


class TestColumnsRoundTrip:
    def test_features_and_mask(self):
        rng = np.random.RandomState(0)
        shape = (14, 12, 6)
        act = random_active(rng, shape, 80, cap=100)
        f = jnp.asarray(rng.randn(100, 5).astype(np.float32))
        cols, colf = columns_from_voxels(f, act)
        assert int(cols.mask.sum()) == 80
        got = voxel_lookup(colf, cols.mask, cols, act)
        want = np.where(np.asarray(act.valid)[:, None], np.asarray(f), 0)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_col_ids_sorted_unique(self):
        rng = np.random.RandomState(1)
        act = random_active(rng, (9, 9, 4), 50, cap=64)
        cols, _ = columns_from_voxels(
            jnp.zeros((64, 3), jnp.float32), act
        )
        ids = np.asarray(cols.col_ids)
        nv = int(cols.valid.sum())
        assert (np.diff(ids[:nv]) > 0).all()
        assert (ids[nv:] == 9 * 9).all()


class TestSubMEquivalence:
    def test_matches_gather_formulation(self):
        rng = np.random.RandomState(2)
        shape = (10, 11, 5)
        v, cin, cout = 70, 4, 6
        act = random_active(rng, shape, v, cap=96)
        f = jnp.asarray(rng.randn(96, cin).astype(np.float32))
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.3).astype(np.float32))

        h = build_hash(act)
        nb = subm_neighbors(act, h, kernel_offsets(3))
        g = gather_by_rank(f, h[1], nb)
        ref = np.asarray(
            jnp.einsum("kvc,kcd->vd", g, w)
            * act.valid[:, None].astype(jnp.float32)
        )

        cols, colf = columns_from_voxels(f, act)
        nbr = column_neighbors(cols)
        out = subm_conv_columns(colf, cols, nbr, w)
        got = voxel_lookup(out, cols.mask, cols, act)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestStridedEquivalence:
    def test_out_set_and_features_match(self):
        rng = np.random.RandomState(3)
        shape = (12, 10, 6)
        v, cin, cout = 60, 3, 5
        act = random_active(rng, shape, v, cap=80)
        f = jnp.asarray(rng.randn(80, cin).astype(np.float32))
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.3).astype(np.float32))

        out_act = downsample_coords(act, 256, 3, (2, 2, 2), (1, 1, 1))
        g = sparse_conv3d_gather(f, act, out_act, 3, (2, 2, 2), (1, 1, 1))
        ref = np.asarray(
            jnp.einsum("kvc,kcd->vd", g, w)
            * out_act.valid[:, None].astype(jnp.float32)
        )

        cols, colf = columns_from_voxels(f, act)
        out_cols = downsample_columns(cols, 256)
        out, omask = strided_conv_columns(colf, cols, out_cols, w)
        # the active out voxels must coincide with downsample_coords' set
        n_out = int(out_act.valid.sum())
        assert int(omask.sum()) == n_out
        got = voxel_lookup(
            np.asarray(out), omask, out_cols, out_act
        )
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestBatchedStencil:
    """The batched fused-kernel path == the per-sample XLA formulation,
    for every method (ref / pallas interpret / forced window-escape
    fallback)."""

    def _data(self, seed=7, b=2):
        rng = np.random.RandomState(seed)
        shape = (12, 10, 6)
        cin, cout = 4, 5
        colss, colfs, nbs, refs = [], [], [], []
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.3).astype(np.float32))
        for i in range(b):
            act = random_active(rng, shape, 60 + 5 * i, cap=96)
            f = jnp.asarray(rng.randn(96, cin).astype(np.float32))
            cols, colf = columns_from_voxels(f, act)
            nbr = column_neighbors(cols)
            colss.append(cols)
            colfs.append(colf)
            nbs.append(nbr)
            refs.append(subm_conv_columns(colf, cols, nbr, w))
        stack = lambda xs: jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *xs
        )
        return stack(colss), jnp.stack(colfs), jnp.stack(nbs), w, \
            np.asarray(jnp.stack(refs))

    @pytest.mark.parametrize("method", ["ref", "pallas_interpret"])
    def test_subm_batched_matches_per_sample(self, method):
        cols, colf, nb, w, ref = self._data()
        got = subm_conv_columns_batched(colf, cols, w, method=method)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4,
                                   atol=1e-4)

    def test_window_escape_falls_back_exactly(self):
        """Tiny window forces the coverage cond onto the reference
        branch — output must stay exact."""
        from lyft3d_tpu.ops import column_sparse as cs

        cols, colf, nb, w, ref = self._data()
        plan = cs._chunk_plan(colf.shape[-1], colf.shape[2], 1)
        fm = colf * cols.mask[..., None].astype(colf.dtype)
        src = jax.vmap(lambda f: cs._chunk_source(f, plan, 1))(fm)
        wc = cs._chunk_weights(
            w.reshape(9, 3, colf.shape[-1], w.shape[-1]), plan, 1
        )
        qids = jax.vmap(cs.subm_qids_one)(cols)
        out = cs.stencil_conv_batched(
            src, qids, cols.col_ids, wc, plan.nc, t_tile=8, w_win=8,
            method="pallas_interpret",
        )
        got = out.reshape(ref.shape[0], colf.shape[1], -1, w.shape[-1])
        got = got[:, :, :colf.shape[2]]
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4,
                                   atol=1e-4)

    @pytest.mark.parametrize("method", ["ref", "pallas_interpret"])
    def test_strided_batched_matches_per_sample(self, method):
        rng = np.random.RandomState(11)
        shape = (12, 10, 6)
        cin, cout, b = 3, 5, 2
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.3).astype(np.float32))
        colss, colfs, outs, refs, masks = [], [], [], [], []
        for i in range(b):
            act = random_active(rng, shape, 55 + 4 * i, cap=80)
            f = jnp.asarray(rng.randn(80, cin).astype(np.float32))
            cols, colf = columns_from_voxels(f, act)
            oc = downsample_columns(cols, 256)
            out, om = strided_conv_columns(colf, cols, oc, w)
            colss.append(cols)
            colfs.append(colf)
            outs.append(oc)
            refs.append(out)
            masks.append(om)
        stack = lambda xs: jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *xs
        )
        bcols, bcolf = stack(colss), jnp.stack(colfs)
        boc = stack(outs)
        got, gmask = strided_conv_columns_batched(
            bcolf, bcols, boc, w, method=method
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(jnp.stack(refs)),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(gmask), np.asarray(jnp.stack(masks))
        )

    def test_batched_gradients_flow(self):
        cols, colf, nb, w, _ = self._data()

        def loss(f, wt):
            o = subm_conv_columns_batched(f, cols, wt, method="ref")
            return jnp.sum(o ** 2)

        gf, gw = jax.grad(loss, argnums=(0, 1))(colf, w)
        assert np.isfinite(np.asarray(gf)).all()
        assert np.isfinite(np.asarray(gw)).all()
        assert float(jnp.abs(gw).sum()) > 0

    def test_subm_reverse_ranks_invariant(self):
        """rev[j, v] = neighbors[8−j, v] inverts the forward rank map:
        rev[j, ranks[j, q]] == q wherever ranks[j, q] ≥ 0."""
        cols, colf, nb, w, _ = self._data()
        nbr = np.asarray(nb)
        rev = nbr[:, ::-1]
        b, k, v = nbr.shape
        for bb in range(b):
            for j in range(k):
                q = np.arange(v)
                hit = nbr[bb, j] >= 0
                assert (rev[bb, j, nbr[bb, j, hit]] == q[hit]).all()

    @pytest.mark.parametrize("method", ["ref", "pallas_interpret"])
    def test_subm_fused_bwd_matches_legacy(self, method):
        """The fused reverse-stencil backward (rev_ranks given) must equal
        the legacy jax.vjp-of-the-reference backward (rev_ranks=None)."""
        from lyft3d_tpu.ops import column_sparse as cs

        cols, colf, nb, w, _ = self._data()
        b, _, nz, cin = colf.shape
        cout = w.shape[-1]
        plan = cs._chunk_plan(cin, nz, 1)

        qids = jax.vmap(cs.subm_qids_one)(cols)

        def loss(f, wt, rev):
            fm = f * cols.mask[..., None].astype(f.dtype)
            src = jax.vmap(lambda x: cs._chunk_source(x, plan, 1))(fm)
            wc = cs._chunk_weights(wt.reshape(9, 3, cin, cout), plan, 1)
            o = cs.stencil_conv_batched(
                src, qids, cols.col_ids, wc, plan.nc, 256, 384, method,
                rev_qids=rev, rev_src_ids=cols.col_ids if rev is not None
                else None,
            )
            o = o.reshape(b, f.shape[1], plan.nc * plan.z, cout)[:, :, :nz]
            return jnp.sum(jnp.sin(o))

        gf_new, gw_new = jax.grad(
            lambda f, wt: loss(f, wt, qids[:, ::-1]), argnums=(0, 1)
        )(colf, w)
        gf_old, gw_old = jax.grad(
            lambda f, wt: loss(f, wt, None), argnums=(0, 1)
        )(colf, w)
        np.testing.assert_allclose(
            np.asarray(gf_new), np.asarray(gf_old), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gw_new), np.asarray(gw_old), rtol=1e-4, atol=1e-5
        )

    def test_strided_fused_bwd_numeric(self):
        """Finite-difference check of the strided layer's fused backward
        (reverse ranks resolved via the parity/divisibility rule)."""
        rng = np.random.RandomState(11)
        shape = (12, 10, 6)
        cin, cout, b = 3, 4, 2
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.3).astype(np.float32))
        colss, colfs = [], []
        for i in range(b):
            act = random_active(rng, shape, 55 + 4 * i, cap=80)
            f = jnp.asarray(rng.randn(80, cin).astype(np.float32))
            cols, colf = columns_from_voxels(f, act)
            colss.append(cols)
            colfs.append(colf)
        stack = lambda xs: jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *xs
        )
        bcols, bcolf = stack(colss), jnp.stack(colfs)
        boc = stack([downsample_columns(c, 256) for c in colss])

        def loss(f, wt):
            o, _ = strided_conv_columns_batched(
                f, bcols, boc, wt, method="ref"
            )
            return jnp.sum(jnp.sin(o))

        gf, gw = jax.grad(loss, argnums=(0, 1))(bcolf, w)
        eps = 1e-3
        f0, w0 = np.asarray(bcolf), np.asarray(w)
        for idx in [(0, 3, 2, 1), (1, 10, 0, 0), (0, 0, 5, 2)]:
            fp, fm = f0.copy(), f0.copy()
            fp[idx] += eps
            fm[idx] -= eps
            num = (loss(jnp.asarray(fp), w) - loss(jnp.asarray(fm), w)) / (
                2 * eps
            )
            assert abs(float(num) - np.asarray(gf)[idx]) < 2e-3
        for idx in [(0, 0, 0), (13, 2, 1), (26, 1, 3)]:
            wp, wm = w0.copy(), w0.copy()
            wp[idx] += eps
            wm[idx] -= eps
            num = (loss(bcolf, jnp.asarray(wp)) - loss(bcolf, jnp.asarray(wm))) / (
                2 * eps
            )
            assert abs(float(num) - np.asarray(gw)[idx]) < 2e-3


class TestDenseBEV:
    def test_matches_voxel_fill(self):
        from lyft3d_tpu.models.second.middle import sparse_to_dense_bev

        rng = np.random.RandomState(4)
        shape = (8, 9, 4)
        act = random_active(rng, shape, 40, cap=64)
        f = jnp.asarray(rng.randn(64, 5).astype(np.float32))
        ref = np.asarray(sparse_to_dense_bev(f, act))
        cols, colf = columns_from_voxels(f, act)
        got = np.asarray(columns_to_dense_bev(colf, cols))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


class TestMiddleModule:
    @pytest.mark.slow
    def test_full_middle_matches_gather_middle(self):
        """Transplant params position-wise between the two middles — the
        whole 3-stage stack must agree on the dense BEV output."""
        from lyft3d_tpu.models.second.middle import (
            SparseMiddle,
            SparseMiddleColumns,
        )

        rng = np.random.RandomState(5)
        shape = (16, 16, 8)
        act = random_active(rng, shape, 120, cap=160)
        f = jnp.asarray(rng.randn(160, 3).astype(np.float32))
        # generous caps: the two formulations cap different things (voxels
        # vs columns), so equivalence holds only when neither cap binds
        kw = dict(stage_features=(8, 12, 16),
                  stage_max_voxels=(512, 512, 512), dtype=jnp.float32)
        ref_m = SparseMiddle(**kw)
        col_m = SparseMiddleColumns(**kw)  # batched module
        fb = f[None]
        actb = jax.tree_util.tree_map(lambda x: x[None], act)
        p_ref = ref_m.init(jax.random.PRNGKey(0), f, act)
        p_col = col_m.init(jax.random.PRNGKey(0), fb, actb)

        # position-wise transplant (both trees: per stage 2 subm + 1 strided,
        # each {kernel, LayerNorm_0{scale,bias}})
        # sorted-path alignment: "SparseConvLayer_i" ↔ "StridedColumnLayer_i"
        # and "SubMConvLayer_i" ↔ "SubMColumnLayer_i" land at the same sorted
        # positions; the shape assert catches any misalignment
        flat_ref = sorted(
            jax.tree_util.tree_flatten_with_path(p_ref)[0],
            key=lambda kv: str(kv[0]),
        )
        orig_flat, orig_def = jax.tree_util.tree_flatten_with_path(p_col)
        flat_col = sorted(orig_flat, key=lambda kv: str(kv[0]))
        mapping = {}
        for (kr, vr), (kc, vc) in zip(flat_ref, flat_col):
            assert vr.shape == vc.shape, (kr, kc, vr.shape, vc.shape)
            mapping[str(kc)] = vr
        rebuilt = jax.tree_util.tree_unflatten(
            orig_def, [mapping[str(k)] for k, _ in orig_flat]
        )

        bev_ref, _ = ref_m.apply(p_ref, f, act)
        bev_col, _ = col_m.apply(rebuilt, fb, actb)
        np.testing.assert_allclose(
            np.asarray(bev_col[0]), np.asarray(bev_ref), rtol=2e-3, atol=2e-3
        )
