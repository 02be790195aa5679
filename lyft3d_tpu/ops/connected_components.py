"""Connected components on a binary grid, on device.

TPU reformulation of the sequential ``cv2.findContours`` stage of the
reference's BEV post-processing (``unet-inference-with-map.py:326-366``):
iterated min-label propagation (8-connectivity) with pointer-jumping path
compression, so convergence is O(log diameter) rounds of vectorized work
instead of a CPU contour walk. All shapes static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["morph_open", "connected_components"]


def _shift_min(x, fill):
    """Min over the 3x3 neighborhood with edge fill (no wraparound).

    One native min reduce_window (TPU pooling hardware path) instead of
    eight roll+where pairs — measured ~an order of magnitude cheaper.
    ``fill`` must be a static python number (reduce_window init value).
    """
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


def connected_components(fg, rounds: int = 6, sweeps_per_round: int = 4):
    """Label 8-connected components of a boolean (H, W) grid.

    Returns int32 labels: each foreground pixel gets the min flat index of
    its component (a stable component id); background pixels get H*W.

    ``rounds`` alternates local min-propagation sweeps (native min-pool)
    with pointer-jumping (label = label[label]); reach grows as
    sweeps·2^rounds, so the defaults cover path diameters ≈ 256 px. The
    gather-heavy compression step is the expensive part on TPU — hence few
    rounds of several cheap pooling sweeps each.
    """
    h, w = fg.shape
    big = jnp.int32(h * w)
    flat_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    labels = jnp.where(fg, flat_idx, big)

    def round_body(_, labels):
        for _ in range(sweeps_per_round):
            neigh = _shift_min(labels, h * w)
            labels = jnp.where(fg, jnp.minimum(labels, neigh), big)
        # Path compression: jump to the label of your label's pixel.
        flat = labels.reshape(-1)
        flat_ext = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
        jumped = flat_ext[jnp.clip(flat, 0, h * w)].reshape(h, w)
        return jnp.where(fg, jnp.minimum(labels, jumped), big)

    return jax.lax.fori_loop(0, rounds, round_body, labels)
