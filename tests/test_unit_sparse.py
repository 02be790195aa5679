"""Z-slab UNIT sparse convs == the BEV-column (dense-z) formulation.

The unit middle (ops/column_sparse.py round-3 section, models/second/
middle.py SparseMiddleUnits) stores only ACTIVE z-slabs of each BEV
column; these tests pin its math to the column formulation (itself pinned
to the per-voxel gather formulation in tests/test_column_sparse.py) on
data where the capacity caps do not bind.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lyft3d_tpu.ops.column_sparse import (
    columns_from_voxels,
    columns_to_dense_bev,
    downsample_columns,
    downsample_units,
    strided_conv_columns,
    strided_conv_units_batched,
    subm_conv_columns,
    subm_conv_columns_batched,
    subm_conv_units_batched,
    units_from_voxels,
    units_to_dense_bev,
    column_neighbors,
)
from lyft3d_tpu.ops.sparse_conv import ActiveSet

from tests.test_column_sparse import random_active


def unit_lookup(colf, mask, units, active, z_slab, ncs):
    """Read back each active voxel's unit feature as a (V, C) array."""
    uids = np.asarray(units.col_ids)
    nxv, _ = units.bev_shape
    nx = nxv // ncs
    out = np.zeros((active.coords.shape[0], colf.shape[-1]), np.float32)
    coords = np.asarray(active.coords)
    valid = np.asarray(active.valid)
    for i in range(coords.shape[0]):
        if not valid[i]:
            continue
        uid = (coords[i, 1] * nx + coords[i, 0]) * ncs + coords[i, 2] // z_slab
        u = int(np.searchsorted(uids, uid))
        assert uids[u] == uid
        zl = coords[i, 2] % z_slab
        assert np.asarray(mask)[u, zl]
        out[i] = np.asarray(colf)[u, zl]
    return out


def stack_trees(xs):
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *xs)


class TestUnitsRoundTrip:
    def test_features_and_mask(self):
        rng = np.random.RandomState(0)
        shape = (14, 12, 8)
        act = random_active(rng, shape, 80, cap=100)
        f = jnp.asarray(rng.randn(100, 5).astype(np.float32))
        units, colf = units_from_voxels(f, act, 4)
        assert int(units.mask.sum()) == 80
        got = unit_lookup(colf, units.mask, units, act, 4, 2)
        want = np.where(np.asarray(act.valid)[:, None], np.asarray(f), 0)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_unit_ids_sorted_unique(self):
        rng = np.random.RandomState(1)
        act = random_active(rng, (9, 9, 4), 50, cap=64)
        units, _ = units_from_voxels(jnp.zeros((64, 3), jnp.float32), act, 2)
        ids = np.asarray(units.col_ids)
        nv = int(units.valid.sum())
        assert (np.diff(ids[:nv]) > 0).all()
        assert (ids[nv:] == 9 * 9 * 2).all()

    def test_dense_bev_matches_columns(self):
        rng = np.random.RandomState(2)
        shape = (10, 11, 8)
        act = random_active(rng, shape, 60, cap=80)
        f = jnp.asarray(rng.randn(80, 6).astype(np.float32))
        cols, ccf = columns_from_voxels(f, act)
        units, ucf = units_from_voxels(f, act, 4)
        d_c = columns_to_dense_bev(ccf, cols)
        d_u = units_to_dense_bev(ucf, units, 2, shape[2])
        np.testing.assert_allclose(
            np.asarray(d_u), np.asarray(d_c), rtol=1e-5, atol=1e-5
        )


class TestUnitSubMEquivalence:
    def _case(self, seed, shape, z_slab, n, cap, cin=4, cout=6, b=2):
        rng = np.random.RandomState(seed)
        ncs = -(-shape[2] // z_slab)
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.3).astype(np.float32))
        acts, units_l, ucf_l, ref_l = [], [], [], []
        for i in range(b):
            act = random_active(rng, shape, n + 3 * i, cap=cap)
            f = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
            cols, ccf = columns_from_voxels(f, act)
            nbr = column_neighbors(cols)
            ref = subm_conv_columns(ccf, cols, nbr, w)
            ref = ref * cols.mask[..., None]
            units, ucf = units_from_voxels(f, act, z_slab)
            acts.append(act)
            units_l.append(units)
            ucf_l.append(ucf)
            # Compare at active voxel sites via the dense grid.
            ref_l.append(columns_to_dense_bev(ref.astype(jnp.float32), cols))
        return (stack_trees(acts), stack_trees(units_l), jnp.stack(ucf_l),
                w, np.asarray(jnp.stack(ref_l)), ncs)

    @pytest.mark.parametrize("method", ["ref", "pallas_interpret"])
    def test_matches_column_formulation(self, method):
        acts, units, ucf, w, ref_dense, ncs = self._case(
            3, (10, 11, 8), 4, 56, 80
        )
        out = subm_conv_units_batched(ucf, units, w, ncs, method=method)
        out = out * units.mask[..., None]
        got = jax.vmap(
            lambda o, u: units_to_dense_bev(
                o.astype(jnp.float32), u, ncs, 8
            )
        )(out, units)
        np.testing.assert_allclose(np.asarray(got), ref_dense,
                                   rtol=1e-4, atol=1e-4)

    def test_uneven_slab_tail(self):
        """nz not divisible by z_slab: the tail slab is partial."""
        acts, units, ucf, w, ref_dense, ncs = self._case(
            4, (9, 8, 7), 3, 40, 64
        )
        assert ncs == 3
        out = subm_conv_units_batched(ucf, units, w, ncs, method="ref")
        out = out * units.mask[..., None]
        got = jax.vmap(
            lambda o, u: units_to_dense_bev(
                o.astype(jnp.float32), u, ncs, 7
            )
        )(out, units)
        np.testing.assert_allclose(np.asarray(got), ref_dense,
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match_column_path(self):
        """Both formulations compute the same function voxel features →
        masked dense output, so grads w.r.t. features and weights agree."""
        rng = np.random.RandomState(5)
        shape = (8, 9, 8)
        act = random_active(rng, shape, 40, cap=64)
        f = jnp.asarray(rng.randn(64, 3).astype(np.float32))
        w = jnp.asarray((rng.randn(27, 3, 4) * 0.3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(9, 8, 8 * 4).astype(np.float32))

        def loss_units(ff, ww):
            units, ucf = units_from_voxels(ff, act, 4)
            o = subm_conv_units_batched(ucf[None], stack_trees([units]),
                                        ww, 2, method="ref")[0]
            o = o * units.mask[..., None]
            d = units_to_dense_bev(o.astype(jnp.float32), units, 2, 8)
            return jnp.sum((d - tgt) ** 2)

        def loss_cols(ff, ww):
            cols, ccf = columns_from_voxels(ff, act)
            o = subm_conv_columns_batched(ccf[None], stack_trees([cols]),
                                          ww, method="ref")[0]
            o = o * cols.mask[..., None]
            d = columns_to_dense_bev(o.astype(jnp.float32), cols)
            return jnp.sum((d - tgt) ** 2)

        gu_f, gu_w = jax.grad(loss_units, argnums=(0, 1))(f, w)
        gc_f, gc_w = jax.grad(loss_cols, argnums=(0, 1))(f, w)
        np.testing.assert_allclose(np.asarray(gu_f), np.asarray(gc_f),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gu_w), np.asarray(gc_w),
                                   rtol=1e-3, atol=1e-3)


class TestUnitStridedEquivalence:
    @pytest.mark.parametrize("method", ["ref", "pallas_interpret"])
    def test_matches_column_formulation(self, method):
        rng = np.random.RandomState(7)
        shape = (12, 10, 8)
        z_slab, ncs = 4, 2
        cin, cout, b = 3, 5, 2
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.3).astype(np.float32))
        units_l, ucf_l, ou_l, ref_l = [], [], [], []
        for i in range(b):
            act = random_active(rng, shape, 50 + 4 * i, cap=80)
            f = jnp.asarray(rng.randn(80, cin).astype(np.float32))
            cols, ccf = columns_from_voxels(f, act)
            oc = downsample_columns(cols, 256)
            ref, om = strided_conv_columns(ccf, cols, oc, w)
            ref = ref * om[..., None]
            units, ucf = units_from_voxels(f, act, z_slab)
            ou = downsample_units(units, ncs, 256)
            units_l.append(units)
            ucf_l.append(ucf)
            ou_l.append(ou)
            ref_l.append(
                columns_to_dense_bev(ref.astype(jnp.float32), oc)
            )
        bunits = stack_trees(units_l)
        bou = stack_trees(ou_l)
        out, omask = strided_conv_units_batched(
            jnp.stack(ucf_l), bunits, bou, w, ncs, method=method
        )
        out = out * omask[..., None]
        nzo = (shape[2] - 1) // 2 + 1
        got = jax.vmap(
            lambda o, u: units_to_dense_bev(
                o.astype(jnp.float32), u, ncs, nzo
            )
        )(out, bou)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(jnp.stack(ref_l)),
            rtol=1e-4, atol=1e-4,
        )

    def test_out_sites_match_columns(self):
        """The unit path's active out sites (valid ∧ mask) == the column
        path's, even though unit-level candidates are coarser."""
        rng = np.random.RandomState(8)
        shape = (12, 10, 8)
        act = random_active(rng, shape, 55, cap=80)
        f = jnp.asarray(rng.randn(80, 3).astype(np.float32))
        w = jnp.asarray((rng.randn(27, 3, 4) * 0.3).astype(np.float32))
        cols, ccf = columns_from_voxels(f, act)
        oc = downsample_columns(cols, 256)
        _, om = strided_conv_columns(ccf, cols, oc, w)
        units, ucf = units_from_voxels(f, act, 4)
        ou = downsample_units(units, 2, 256)
        _, omu = strided_conv_units_batched(
            ucf[None], stack_trees([units]), stack_trees([ou]), w, 2,
            method="ref",
        )
        nzo = (shape[2] - 1) // 2 + 1
        dense_c = columns_to_dense_bev(
            om[..., None].astype(jnp.float32), oc
        )
        dense_u = units_to_dense_bev(
            omu[0][..., None].astype(jnp.float32), ou, 2, nzo
        )
        np.testing.assert_array_equal(np.asarray(dense_u),
                                      np.asarray(dense_c))


class TestUnitMiddleModule:
    def test_full_middle_matches_column_middle(self):
        """SparseMiddleUnits == SparseMiddleColumns with identical weights
        (layer params copied by position) on cap-free data."""
        from lyft3d_tpu.models.second.middle import (
            SparseMiddleColumns,
            SparseMiddleUnits,
        )

        rng = np.random.RandomState(9)
        shape = (16, 16, 8)
        b, cap = 2, 96
        acts, fs = [], []
        for i in range(b):
            acts.append(random_active(rng, shape, 70 + 5 * i, cap=cap))
            fs.append(rng.randn(cap, 4).astype(np.float32))
        act = stack_trees(acts)
        f = jnp.asarray(np.stack(fs))

        kw = dict(stage_features=(8, 16), stage_max_voxels=(512, 512),
                  subm_per_stage=2, dtype=jnp.float32, method="ref")
        m_c = SparseMiddleColumns(**kw)
        m_u = SparseMiddleUnits(z_slab=4, **kw)
        p_c = m_c.init(jax.random.PRNGKey(0), f, act)
        p_u = m_u.init(jax.random.PRNGKey(0), f, act)
        # Same layer structure in the same order — copy by position.
        lc = jax.tree_util.tree_leaves(p_c)
        lu = jax.tree_util.tree_leaves(p_u)
        assert [x.shape for x in lc] == [x.shape for x in lu]
        td = jax.tree_util.tree_structure(p_u)
        p_u2 = jax.tree_util.tree_unflatten(td, lc)
        out_c, _ = m_c.apply(p_c, f, act)
        out_u, _ = m_u.apply(p_u2, f, act)
        np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_c),
                                   rtol=2e-3, atol=2e-3)


class TestEvenSelect:
    """Cap-overflow selection policy (ops/column_sparse._even_select)."""

    def test_identity_under_cap(self):
        from lyft3d_tpu.ops.column_sparse import _even_select

        vals = jnp.asarray(
            np.concatenate([np.arange(10) * 7, np.full(22, 2**30)]),
            jnp.int32,
        )
        sel = _even_select(vals, jnp.int32(10), 16)
        np.testing.assert_array_equal(np.asarray(sel), np.arange(16))

    def test_even_spread_over_cap(self):
        from lyft3d_tpu.ops.column_sparse import _even_select

        n, cap = 103, 16
        vals = jnp.asarray(
            np.concatenate([np.sort(np.random.RandomState(0).choice(
                10_000, n, replace=False)), np.full(29, 2**30)]),
            jnp.int32,
        )
        sel = np.asarray(_even_select(vals, jnp.int32(n), cap))
        # Strictly increasing positions, all within the unique prefix.
        assert (np.diff(sel) > 0).all()
        assert sel[0] == 0 and sel[-1] < n
        # Evenly rank-spaced: consecutive gaps differ by at most 1.
        gaps = np.diff(sel)
        assert gaps.max() - gaps.min() <= 1
        # Gathered values stay ascending-unique.
        got = np.asarray(vals)[sel]
        assert (np.diff(got) > 0).all()

    def test_downsample_units_overflow_spreads(self):
        """On cap overflow the surviving output units span the id range
        rather than the lowest-id (spatially banded) prefix."""
        rng = np.random.RandomState(3)
        shape = (32, 32, 8)
        cap = 256
        act = random_active(rng, shape, 250, cap=cap)
        f = jnp.asarray(rng.randn(cap, 3).astype(np.float32))
        units, _ = units_from_voxels(f, act, 4)
        full = downsample_units(units, 2, 512)
        n_full = int(np.asarray(full.valid).sum())
        max_out = max(n_full // 2, 8)
        capped = downsample_units(units, 2, max_out)
        cv = np.asarray(capped.valid)
        assert cv.sum() == max_out
        ids_full = np.asarray(full.col_ids)[np.asarray(full.valid)]
        ids_cap = np.asarray(capped.col_ids)[cv]
        # Survivors reach into the top decile of the full id range —
        # a truncated prefix would stop at the median.
        assert ids_cap.max() >= np.quantile(ids_full, 0.9)
        assert (np.diff(ids_cap) > 0).all()


@pytest.mark.slow
class TestFullMiddleGradients:
    def test_full_middle_grads_match_column_middle(self):
        """Gradients through the FULL SparseMiddleUnits stack (ufv +
        subm + strided x2 stages + to-BEV, custom VJPs throughout) equal
        the column-oracle middle's — the r5 root-cause session showed the
        forward-only oracle test cannot catch a broken backward (a flat
        learning curve was initially suspected to be one)."""
        from lyft3d_tpu.models.second.middle import (
            SparseMiddleColumns,
            SparseMiddleUnits,
        )
        rng = np.random.RandomState(9)
        shape = (16, 16, 8)
        b, cap = 2, 96
        acts, fs = [], []
        for i in range(b):
            acts.append(random_active(rng, shape, 70 + 5 * i, cap=cap))
            fs.append(rng.randn(cap, 4).astype(np.float32))
        act = stack_trees(acts)
        f = jnp.asarray(np.stack(fs))
        kw = dict(stage_features=(8, 16), stage_max_voxels=(512, 512),
                  subm_per_stage=2, dtype=jnp.float32, method="ref")
        m_c = SparseMiddleColumns(**kw)
        m_u = SparseMiddleUnits(z_slab=4, **kw)
        p_c = m_c.init(jax.random.PRNGKey(0), f, act)
        td = jax.tree_util.tree_structure(
            m_u.init(jax.random.PRNGKey(0), f, act)
        )
        p_u = jax.tree_util.tree_unflatten(
            td, jax.tree_util.tree_leaves(p_c)
        )
        out_shape = jax.eval_shape(lambda: m_c.apply(p_c, f, act)[0]).shape
        tgt = jnp.asarray(rng.randn(*out_shape).astype(np.float32))

        def loss(m, p, ff):
            out, _ = m.apply(p, ff, act)
            return jnp.sum((out - tgt) ** 2)

        gc_p, gc_f = jax.grad(lambda p, ff: loss(m_c, p, ff),
                              argnums=(0, 1))(p_c, f)
        gu_p, gu_f = jax.grad(lambda p, ff: loss(m_u, p, ff),
                              argnums=(0, 1))(p_u, f)
        for a, bb in zip(jax.tree_util.tree_leaves(gc_p),
                         jax.tree_util.tree_leaves(gu_p)):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(gu_f), np.asarray(gc_f),
                                   rtol=2e-3, atol=2e-3)
