"""Connected components on a binary grid, on device.

TPU reformulation of the sequential ``cv2.findContours`` stage of the
reference's BEV post-processing (``unet-inference-with-map.py:326-366``):
iterated min-label propagation (8-connectivity) via native min
``reduce_window`` pooling.

Performance note (measured on v5e): one pooling sweep over a 336² grid is
~microseconds, while one pointer-jumping compression step (a 113k-element
random gather) is ~1.2 ms — TPU random gathers are slow. Detection masks are
compact blobs (a bus is ~30 px), so the default is pure pooling sweeps
(reach = ``sweeps`` px of path diameter) with ``compress_rounds=0``;
pathological snake-shaped components can enable pointer jumping, which
multiplies the reach by ~2^rounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["morph_open", "connected_components"]


def _shift_min(x, fill: int):
    """Min over the 3x3 neighborhood with edge fill (no wraparound) — one
    native min reduce_window (TPU pooling hardware path)."""
    return jax.lax.reduce_window(x, int(fill), jax.lax.min, (3, 3), (1, 1), "SAME")


def morph_open(mask, iterations: int = 1):
    """Binary morphological opening with the 3x3 ellipse (plus-shaped)
    structuring element — same as the reference's
    ``cv2.morphologyEx(MORPH_OPEN, ellipse(3,3))`` (:323, :358-366)."""

    def plus_pool(x, op, fill):
        h, w = x.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        out = x
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifted = jnp.roll(x, (dy, dx), axis=(0, 1))
            valid = jnp.ones((h, w), bool)
            if dy == 1:
                valid &= rows > 0
            if dy == -1:
                valid &= rows < h - 1
            if dx == 1:
                valid &= cols > 0
            if dx == -1:
                valid &= cols < w - 1
            out = op(out, jnp.where(valid, shifted, fill))
        return out

    x = mask.astype(jnp.float32)
    for _ in range(iterations):
        x = plus_pool(x, jnp.minimum, 1.0)  # erode (border treated as fg like cv2)
    for _ in range(iterations):
        x = plus_pool(x, jnp.maximum, 0.0)  # dilate
    return x > 0.5


def connected_components(fg, sweeps: int = 64, compress_rounds: int = 0):
    """Label 8-connected components of a boolean (H, W) grid.

    Returns int32 labels: each foreground pixel gets the min flat index of
    its component (a stable component id); background pixels get H*W.

    Args:
        sweeps: min-pooling propagation sweeps (reach ≈ sweeps px of path
            diameter without compression).
        compress_rounds: optional pointer-jumping steps (label = label[label])
            interleaved evenly between sweep blocks; each round roughly
            doubles the reach but costs an expensive random gather.
    """
    h, w = fg.shape
    big = jnp.int32(h * w)
    flat_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    labels = jnp.where(fg, flat_idx, big)

    def sweep_block(labels, n):
        def body(_, labels):
            neigh = _shift_min(labels, h * w)
            return jnp.where(fg, jnp.minimum(labels, neigh), big)

        return jax.lax.fori_loop(0, n, body, labels)

    def compress(labels):
        flat = labels.reshape(-1)
        flat_ext = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
        jumped = flat_ext[jnp.clip(flat, 0, h * w)].reshape(h, w)
        return jnp.where(fg, jnp.minimum(labels, jumped), big)

    if compress_rounds <= 0:
        return sweep_block(labels, sweeps)
    per_block = max(sweeps // (compress_rounds + 1), 1)
    for _ in range(compress_rounds):
        labels = sweep_block(labels, per_block)
        labels = compress(labels)
    return sweep_block(labels, per_block)
