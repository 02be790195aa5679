"""Device mesh and sharding utilities.

The TPU-native replacement for the reference's single-host
``torch.nn.DataParallel`` (SURVEY.md §2.7): batch-dim data parallelism over
the ICI mesh via ``jax.sharding`` — XLA inserts the gradient all-reduce — plus
optional tensor parallelism by sharding wide conv/dense output channels over
a ``model`` axis. No NCCL analogue exists or is needed.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ensure_devices", "make_mesh", "make_data_mesh", "shard_batch",
           "replicate", "data_parallel_sharding", "tensor_parallel_params"]


def ensure_devices(n: int) -> int:
    """Guarantee ≥ ``n`` JAX devices, forcing a virtual CPU platform if the
    host exposes fewer (e.g. the single-chip TPU tunnel). Safe to call
    whether or not a backend is already initialized — if one is, it is torn
    down first (same recipe as tests/conftest.py, which must run before any
    backend init; this helper also handles the post-init case the driver's
    dryrun hits). Returns the resulting device count.
    """
    if len(jax.devices()) >= n:
        return len(jax.devices())
    import jax.extend.backend as jeb

    jeb.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(n, 1))
    count = len(jax.devices())
    assert count >= n, (count, n)
    return count


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """(data, model) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def make_data_mesh(batch_size: int, n_devices: Optional[int] = None) -> Mesh:
    """Largest data-parallel mesh that divides ``batch_size`` evenly."""
    avail = n_devices or len(jax.devices())
    n = max(d for d in range(1, avail + 1) if batch_size % d == 0)
    return make_mesh(n)


def shard_batch(mesh: Mesh, batch):
    """Put a host batch onto the mesh, sharded along the leading axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_sharding(mesh: Mesh):
    """(batch_sharding, replicated_sharding) pair for pjit in/out specs."""
    return NamedSharding(mesh, P("data")), NamedSharding(mesh, P())


def tensor_parallel_params(mesh: Mesh, params, min_features: int = 256):
    """Shard wide conv/dense kernels' output-channel dim over the ``model``
    axis (simple Megatron-style TP for convnets); everything else replicated.

    Sharding the last axis of any kernel whose output features ≥
    ``min_features`` and divide the axis size evenly.
    """
    axis_size = mesh.shape["model"]

    def place(path, x):
        key = jax.tree_util.keystr(path)
        if (
            axis_size > 1
            and key.endswith("kernel']")
            and x.ndim >= 2
            and x.shape[-1] >= min_features
            and x.shape[-1] % axis_size == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def make_train_step_dp(loss_fn, tx, mesh: Mesh):
    """Jitted data-parallel train step with explicit shardings.

    The drop-in replacement for the reference's ``DataParallel`` wrapper
    (``second/pytorch/train.py:207-208``, ``train_rcnn.py:252-253``):
    params/opt-state replicated, batch sharded on ``data``, XLA inserts the
    gradient all-reduce over ICI. ``loss_fn(params, batch) -> scalar``.
    """
    import optax

    batch_sh, rep_sh = data_parallel_sharding(mesh)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(rep_sh, rep_sh, batch_sh),
        out_shardings=(rep_sh, rep_sh, rep_sh),
    )


def bev_rasterize_point_sharded(mesh: Mesh, points, valid, **raster_kw):
    """Point-parallel BEV rasterization: shard the point dimension over the
    ``data`` axis, rasterize each shard locally, ``psum`` the count grids.

    The scale axis the reference bounds with subsampling (SURVEY §5
    long-context note: 10-sweep aggregation grows clouds to ~0.7M points)
    instead sharded over ICI — counts are additive, so the per-shard
    raster + all-reduce is exact.

    Args:
        points: (N, 3+) point cloud, N divisible by the data-axis size.
        valid: (N,) bool.
    Returns: (H, W, C) float32 counts, replicated.
    """
    from functools import partial

    from jax.experimental.shard_map import shard_map

    from lyft3d_tpu.ops.bev_raster import bev_rasterize_matmul

    def local(p, v):
        counts = bev_rasterize_matmul(p, v, **raster_kw)
        return jax.lax.psum(counts, "data")

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
    )
    return fn(points, valid)
