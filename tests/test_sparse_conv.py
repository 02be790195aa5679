"""Sparse conv tests: neighbor lookup, submanifold conv vs dense conv3d
reference, strided downsample coords vs brute force, middle extractor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lyft3d_tpu.models.second.middle import (
    SparseConvLayer,
    SparseMiddle,
    SubMConvLayer,
    sparse_to_dense_bev,
)
from lyft3d_tpu.ops.sparse_conv import (
    ActiveSet,
    build_hash,
    downsample_coords,
    kernel_offsets,
    lookup,
    sparse_conv3d_gather,
    subm_conv3d_gather,
)

SHAPE = (8, 8, 4)  # (nx, ny, nz)


def make_active(n_real, n_pad, seed=0):
    rng = np.random.RandomState(seed)
    flat = rng.choice(SHAPE[0] * SHAPE[1] * SHAPE[2], size=n_real, replace=False)
    ix = flat % SHAPE[0]
    iy = (flat // SHAPE[0]) % SHAPE[1]
    iz = flat // (SHAPE[0] * SHAPE[1])
    coords = np.zeros((n_real + n_pad, 3), np.int32)
    coords[:n_real] = np.stack([ix, iy, iz], -1)
    valid = np.zeros(n_real + n_pad, bool)
    valid[:n_real] = True
    return ActiveSet(jnp.array(coords), jnp.array(valid), SHAPE)


class TestLookup:
    def test_lookup_hits_and_misses(self):
        active = make_active(20, 4)
        hash_ = build_hash(active)
        idx = lookup(*hash_, active.coords, active.valid, SHAPE)
        got = np.asarray(idx)
        assert (got[:20] == np.arange(20)).all()
        assert (got[20:] == -1).all()
        # Out-of-bounds query.
        q = jnp.array([[-1, 0, 0], [100, 0, 0]], jnp.int32)
        idx = lookup(*hash_, q, jnp.array([True, True]), SHAPE)
        assert (np.asarray(idx) == -1).all()


def dense_from_active(features, active):
    nx, ny, nz = active.spatial_shape
    c = features.shape[-1]
    dense = np.zeros((nx, ny, nz, c), np.float32)
    for i in range(features.shape[0]):
        if active.valid[i]:
            x, y, z = np.asarray(active.coords[i])
            dense[x, y, z] = np.asarray(features[i])
    return dense


class TestSubMConv:
    def test_matches_dense_conv_at_active_sites(self):
        """SubM conv == dense 3D conv evaluated at active sites, given inputs
        that are zero off the active set — verified against jax.lax.conv."""
        rng = np.random.RandomState(1)
        active = make_active(30, 6, seed=2)
        cin, cout = 5, 7
        feats = jnp.array(
            rng.randn(36, cin).astype(np.float32)
            * np.asarray(active.valid)[:, None]
        )
        offsets = kernel_offsets(3)
        w = jnp.array(rng.randn(27, cin, cout).astype(np.float32))

        gathered = subm_conv3d_gather(feats, active, build_hash(active), offsets)
        out = jnp.einsum("kvc,kcd->vd", gathered, w)

        dense = dense_from_active(feats, active)  # (nx, ny, nz, c)
        # lax 3D conv: NHWDC ~ treat (x, y, z) as spatial dims.
        w_dense = np.zeros((3, 3, 3, cin, cout), np.float32)
        for k, (dx, dy, dz) in enumerate(np.asarray(offsets)):
            w_dense[dx + 1, dy + 1, dz + 1] = np.asarray(w[k])
        ref = jax.lax.conv_general_dilated(
            jnp.array(dense[None]), jnp.array(w_dense),
            window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )[0]
        for i in range(30):
            x, y, z = np.asarray(active.coords[i])
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(ref[x, y, z]), rtol=1e-4, atol=1e-4
            )

    def test_precomputed_neighbors_match_gather_path(self):
        """The per-stage shared-neighbor path (subm_neighbors ranks +
        gather_by_rank) must equal the direct subm_conv3d_gather path —
        regression for the round-1 fill-formulation bug where interspersed
        unmatched sentinels silently zeroed neighbor rows (ADVICE r1 high:
        a stencil's partial matching is NOT globally sorted, so it must
        never take the dense-fill assume_sorted path)."""
        from lyft3d_tpu.ops.sparse_conv import gather_by_rank, subm_neighbors

        rng = np.random.RandomState(9)
        # Sparse occupancy → most stencil queries miss (the advisor's
        # interspersed-unmatched regime).
        active = make_active(12, 4, seed=10)
        feats = jnp.array(
            rng.randn(16, 5).astype(np.float32)
            * np.asarray(active.valid)[:, None]
        )
        hash_ = build_hash(active)
        offsets = kernel_offsets(3)
        direct = subm_conv3d_gather(feats, active, hash_, offsets)
        ranks = subm_neighbors(active, hash_, offsets)
        shared = gather_by_rank(feats, hash_[1], ranks)
        np.testing.assert_allclose(np.asarray(shared), np.asarray(direct))
        # and the layer consumes the shared ranks identically
        layer = SubMConvLayer(6, dtype=jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), feats, active, hash_)
        out_direct = layer.apply(params, feats, active, hash_)
        out_shared = layer.apply(params, feats, active, hash_, neighbors=ranks)
        np.testing.assert_allclose(
            np.asarray(out_shared), np.asarray(out_direct), rtol=1e-5, atol=1e-5
        )

    def test_submanifold_only_active_outputs(self):
        active = make_active(10, 2)
        feats = jnp.ones((12, 4))
        layer = SubMConvLayer(6, dtype=jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), feats, active, build_hash(active))
        out = layer.apply(params, feats, active, build_hash(active))
        assert out.shape == (12, 6)
        assert np.allclose(np.asarray(out[10:]), 0.0)  # padding rows zeroed


class TestDownsample:
    def brute_outputs(self, active, k=3, s=2, p=1):
        outs = set()
        nx, ny, nz = active.spatial_shape
        oshape = tuple((d + 2 * p - k) // s + 1 for d in (nx, ny, nz))
        for i in range(active.coords.shape[0]):
            if not active.valid[i]:
                continue
            c = np.asarray(active.coords[i])
            for kk in np.ndindex(k, k, k):
                num = c + p - np.array(kk)
                if np.all(num % s == 0):
                    o = num // s
                    if np.all(o >= 0) and np.all(o < oshape):
                        outs.add(tuple(o))
        return outs, oshape

    def test_matches_brute_force(self):
        active = make_active(25, 5, seed=3)
        out = downsample_coords(active, max_out=128)
        want, oshape = self.brute_outputs(active)
        assert out.spatial_shape == oshape
        got = {
            tuple(np.asarray(out.coords[i]))
            for i in range(128)
            if out.valid[i]
        }
        assert got == want

    def test_max_out_cap(self):
        active = make_active(30, 0, seed=4)
        out = downsample_coords(active, max_out=4)
        assert int(np.asarray(out.valid).sum()) == 4


class TestStridedConv:
    def test_matches_dense_strided_conv(self):
        rng = np.random.RandomState(5)
        active = make_active(30, 6, seed=6)
        cin, cout = 4, 6
        feats = jnp.array(
            rng.randn(36, cin).astype(np.float32) * np.asarray(active.valid)[:, None]
        )
        out_active = downsample_coords(active, max_out=64)
        w = jnp.array(rng.randn(27, cin, cout).astype(np.float32))
        gathered = sparse_conv3d_gather(feats, active, out_active)
        out = jnp.einsum("kvc,kcd->vd", gathered, w)

        dense = dense_from_active(feats, active)
        # Weight index k ↔ offsets kk in [0,3)³ (itertools order).
        w_dense = np.zeros((3, 3, 3, cin, cout), np.float32)
        offs = np.asarray(kernel_offsets(3)) + 1
        for k, (dx, dy, dz) in enumerate(offs):
            w_dense[dx, dy, dz] = np.asarray(w[k])
        ref = jax.lax.conv_general_dilated(
            jnp.array(dense[None]), jnp.array(w_dense),
            window_strides=(2, 2, 2), padding=((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )[0]
        for i in range(out_active.coords.shape[0]):
            if not out_active.valid[i]:
                continue
            x, y, z = np.asarray(out_active.coords[i])
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(ref[x, y, z]), rtol=1e-4, atol=1e-4
            )


class TestMiddle:
    def test_sparse_to_dense_bev(self):
        active = ActiveSet(
            jnp.array([[1, 2, 0], [3, 1, 1]], jnp.int32),
            jnp.array([True, True]),
            (4, 4, 2),
        )
        feats = jnp.array([[1.0, 2.0], [3.0, 4.0]])
        bev = sparse_to_dense_bev(feats, active)
        assert bev.shape == (4, 4, 4)  # (ny, nx, nz*c)
        np.testing.assert_allclose(np.asarray(bev[2, 1, :2]), [1.0, 2.0])  # z=0 slot
        np.testing.assert_allclose(np.asarray(bev[1, 3, 2:]), [3.0, 4.0])  # z=1 slot

    def test_sparse_middle_shapes_and_jit(self):
        active = make_active(40, 8, seed=7)
        feats = jnp.ones((48, 4), jnp.float32)
        mid = SparseMiddle(
            stage_features=(8, 16),
            stage_max_voxels=(64, 32),
            subm_per_stage=1,
            strides=((2, 2, 2), (2, 2, 2)),
            dtype=jnp.float32,
        )
        params = jax.jit(mid.init)(jax.random.PRNGKey(0), feats, active)
        bev, out_active = jax.jit(mid.apply)(params, feats, active)
        # (8,8,4) → /2 → (4,4,2) → /2 → (2,2,1): BEV (ny=2, nx=2, nz*C=16).
        assert bev.shape == (2, 2, 16)
        assert out_active.spatial_shape == (2, 2, 1)
        assert np.isfinite(np.asarray(bev)).all()


class TestLookupMachinery:
    """lookup_batch / match_slots edge cases (packed merge-sort paths)."""

    def test_lookup_batch_matches_naive(self):
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.ops.sparse_conv import lookup_batch

        rng = np.random.RandomState(0)
        big = 1000
        v, k, q = 40, 5, 30
        sorted_ids = np.sort(rng.choice(big, v, replace=False)).astype(np.int32)
        # unique per row (the producer contract: queries are distinct coords)
        qids = np.stack([
            rng.choice(big, q, replace=False) for _ in range(k)
        ]).astype(np.int32)
        qids[0, :10] = sorted_ids[:10]
        qids[0] = np.concatenate([qids[0][:10], np.setdiff1d(qids[0][10:], sorted_ids[:10])[: q - 10]])
        ok = rng.rand(k, q) < 0.9
        got = np.asarray(lookup_batch(jnp.asarray(sorted_ids), jnp.int32(big),
                                      jnp.asarray(qids), jnp.asarray(ok)))
        for i in range(k):
            for j in range(q):
                if ok[i, j] and qids[i, j] in sorted_ids:
                    assert got[i, j] == int(np.searchsorted(sorted_ids, qids[i, j]))
                else:
                    assert got[i, j] == -1

    def test_match_slots_is_lookup_transpose(self):
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.ops.sparse_conv import lookup_batch, match_slots

        rng = np.random.RandomState(1)
        big = 500
        v, k, q = 25, 4, 25
        sorted_ids = np.sort(rng.choice(big, v, replace=False)).astype(np.int32)
        qids = np.stack([
            np.sort(rng.choice(big, q, replace=False)) for _ in range(k)
        ]).astype(np.int32)
        ok = np.ones((k, q), bool)
        ranks = np.asarray(lookup_batch(jnp.asarray(sorted_ids), jnp.int32(big),
                                        jnp.asarray(qids), jnp.asarray(ok)))
        slots = np.asarray(match_slots(jnp.asarray(sorted_ids), jnp.int32(big),
                                       jnp.asarray(qids), jnp.asarray(ok)))
        for i in range(k):
            # transpose relation: ranks[i, s] == r  ⟺  slots[i, r] == s
            for s in range(q):
                r = ranks[i, s]
                if r >= 0:
                    assert slots[i, r] == s
            for r in range(v):
                s = slots[i, r]
                if s < q:
                    assert ranks[i, s] == r
            # unmatched keys carry the sentinel
            assert ((slots[i] == q) | (slots[i] < q)).all()

    def test_empty_and_all_invalid(self):
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.ops.sparse_conv import lookup_batch, match_slots

        sorted_ids = jnp.asarray(np.array([700, 700, 700], np.int32))  # all pad
        qids = jnp.asarray(np.array([[1, 2, 700]], np.int32))
        ok = jnp.asarray(np.array([[True, True, False]]))
        got = np.asarray(lookup_batch(sorted_ids, jnp.int32(700), qids, ok))
        assert (got == -1).all()
        slots = np.asarray(match_slots(sorted_ids, jnp.int32(700), qids, ok))
        assert (slots == 3).all()


class TestResolveIdsTable:
    """Dense rank-table resolution == merge resolution (the TPU default)."""

    def test_table_matches_merge_random(self):
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.ops.sparse_conv import resolve_ids

        rng = np.random.RandomState(2)
        volume = 1200
        v, k, q = 50, 7, 60
        sorted_ids = np.sort(
            rng.choice(volume, v - 8, replace=False)
        ).astype(np.int32)
        # invalid tail carries the sentinel id == volume (the producer
        # contract from _flat_ids / downsample_coords)
        sorted_ids = np.concatenate(
            [sorted_ids, np.full(8, volume, np.int32)]
        )
        qids = np.stack(
            [rng.choice(volume, q, replace=False) for _ in range(k)]
        ).astype(np.int32)
        # intersperse sentinel (invalid/OOB) queries everywhere
        qids[rng.rand(k, q) < 0.3] = volume
        qids[1, :5] = sorted_ids[:5]  # guaranteed hits
        big = jnp.int32(volume)
        merge = np.asarray(
            resolve_ids(jnp.asarray(sorted_ids), big, jnp.asarray(qids),
                        method="merge")
        )
        table = np.asarray(
            resolve_ids(jnp.asarray(sorted_ids), big, jnp.asarray(qids),
                        method="table", volume=volume)
        )
        np.testing.assert_array_equal(table, merge)

    def test_table_empty_and_all_invalid(self):
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.ops.sparse_conv import resolve_ids

        volume = 700
        sorted_ids = jnp.asarray(np.full(3, volume, np.int32))  # all pad
        qids = jnp.asarray(np.array([[1, 2, volume]], np.int32))
        got = np.asarray(
            resolve_ids(sorted_ids, jnp.int32(volume), qids,
                        method="table", volume=volume)
        )
        assert (got == -1).all()

    def test_auto_uses_table_and_agrees_end_to_end(self):
        """subm_neighbors under the auto default == forced merge."""
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.ops.sparse_conv import (
            ActiveSet, build_hash, kernel_offsets, subm_neighbors,
        )

        rng = np.random.RandomState(3)
        shape = (12, 10, 6)
        n = 64
        coords = np.stack([
            rng.randint(0, shape[0], n), rng.randint(0, shape[1], n),
            rng.randint(0, shape[2], n),
        ], -1).astype(np.int32)
        flat = (coords[:, 2] * shape[1] + coords[:, 1]) * shape[0] + coords[:, 0]
        _, first = np.unique(flat, return_index=True)
        valid = np.zeros(n, bool)
        valid[first] = True
        act = ActiveSet(coords=jnp.asarray(coords), valid=jnp.asarray(valid),
                        spatial_shape=shape)
        h = build_hash(act)
        offs = kernel_offsets(3)
        auto = np.asarray(subm_neighbors(act, h, offs))
        merge = np.asarray(subm_neighbors(act, h, offs, method="merge"))
        np.testing.assert_array_equal(auto, merge)
