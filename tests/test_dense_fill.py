"""fill_rows_by_id == scatter-add for unique ids (the producer contract)."""

import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.ops.dense_fill import fill_rows_by_id


class TestFillRowsById:
    def test_matches_scatter_unique_ids(self):
        rng = np.random.RandomState(0)
        v, c, rows = 64, 5, 200
        ids = jnp.asarray(rng.choice(rows, v, replace=False).astype(np.int32))
        feats = jnp.asarray(rng.randn(v, c).astype(np.float32))
        valid = jnp.asarray(rng.rand(v) < 0.8)
        ref = jnp.zeros((rows, c)).at[jnp.where(valid, ids, rows)].add(
            feats * valid[:, None], mode="drop"
        )
        out = fill_rows_by_id(feats, ids, valid, rows)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    def test_unsorted_ids_and_all_invalid(self):
        feats = jnp.array([[1.0], [2.0], [3.0]])
        ids = jnp.array([5, 1, 3], jnp.int32)  # unsorted
        out = fill_rows_by_id(feats, ids, jnp.array([True, True, True]), 8)
        assert float(out[5, 0]) == 1.0 and float(out[1, 0]) == 2.0
        assert float(out[3, 0]) == 3.0 and float(jnp.abs(out).sum()) == 6.0
        none = fill_rows_by_id(feats, ids, jnp.zeros(3, bool), 8)
        assert float(jnp.abs(none).sum()) == 0.0

    def test_duplicate_ids_pick_one(self):
        feats = jnp.array([[1.0], [2.0]])
        ids = jnp.array([4, 4], jnp.int32)
        out = fill_rows_by_id(feats, ids, jnp.array([True, True]), 8)
        assert float(out[4, 0]) in (1.0, 2.0)

    def test_pallas_kernel_matches_scatter(self):
        """Interpret-mode pallas fill == scatter fill (integer features for
        exactness; sorted-unique ids per the producer contract)."""
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.ops.dense_fill import (
            fill_rows_by_id,
            fill_rows_by_id_pallas,
        )

        rng = np.random.RandomState(1)
        for rows, tile in [(1000, 256), (1024, 256)]:
            v, c = 300, 8
            ids = np.sort(rng.choice(rows, v, replace=False)).astype(np.int32)
            feats = jnp.asarray(rng.randint(-50, 50, (v, c)).astype(np.float32))
            valid = jnp.asarray(rng.rand(v) < 0.9)
            ref = fill_rows_by_id(feats, jnp.asarray(ids), valid, rows,
                                  assume_sorted=True, method="scatter")
            out = fill_rows_by_id_pallas(feats, jnp.asarray(ids), valid, rows,
                                         tile=tile, interpret=True)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_pallas_fill_gradient(self):
        """custom-vjp gradient == scatter-path autodiff gradient (training
        through the pillar scatter)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from lyft3d_tpu.ops.dense_fill import (
            fill_rows_by_id,
            fill_rows_by_id_pallas,
        )

        rng = np.random.RandomState(2)
        v, c, rows = 100, 4, 300
        ids = np.sort(rng.choice(rows, v, replace=False)).astype(np.int32)
        feats = jnp.asarray(rng.randn(v, c).astype(np.float32))
        valid = jnp.asarray(rng.rand(v) < 0.85)
        w = jnp.asarray(rng.randn(rows, c).astype(np.float32))

        def loss_pallas(f):
            out = fill_rows_by_id_pallas(f, jnp.asarray(ids), valid, rows,
                                         tile=128, interpret=True)
            return jnp.sum(out * w)

        def loss_scatter(f):
            out = fill_rows_by_id(f, jnp.asarray(ids), valid, rows,
                                  assume_sorted=True, method="scatter")
            return jnp.sum(out * w)

        gp = jax.grad(loss_pallas)(feats)
        gs = jax.grad(loss_scatter)(feats)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), rtol=1e-5)
