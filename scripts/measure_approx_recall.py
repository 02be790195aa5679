#!/usr/bin/env python
"""Recall of the approx_min_k first-k path vs exact top_k on TPU, at the
production ball-query shapes, with REALISTICALLY ORDERED points.

ADVICE r4: approx_min_k's recall target assumes the true top-k spread
uniformly across lanes; our keys are point indices and in-radius
neighbors are index-clustered in scan-/sort-ordered clouds. This script
measures per-row recall (|approx ∩ exact| / min(count, k)) for:
  - "sorted" clouds (points sorted by x — the worst clustered case),
  - "scan" clouds (lidar-ring-like azimuth order),
  - "uniform" clouds (the assumption's best case),
at the stage-0 shape (4096 centers x 16384 points, k=32) and the RCNN
shape (512 points, k=64 — below _APPROX_MIN_N, listed for completeness).

Usage: python scripts/measure_approx_recall.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lyft3d_tpu.ops import pointnet2 as p2


def make_cloud(kind: str, n: int, rng) -> np.ndarray:
    pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 1, n)
    if kind == "sorted":
        pts = pts[np.argsort(pts[:, 0])]
    elif kind == "scan":
        az = np.arctan2(pts[:, 1], pts[:, 0])
        ring = (np.linalg.norm(pts[:, :2], axis=1) // 10).astype(int)
        pts = pts[np.lexsort((az, ring))]
    return pts


def recall_for(kind: str, n=16384, s=4096, k=32, radius=4.0, seed=0):
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(make_cloud(kind, n, rng))
    valid = jnp.ones((n,), bool)
    centers = pts[rng.choice(n, s, replace=False)]

    d2 = jnp.sum((centers[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    mask = (d2 < radius * radius) & valid[None, :]

    # Exact first-k (force the top_k branch regardless of backend).
    key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    neg, _ = jax.lax.top_k(-key, k)
    exact = np.asarray(-neg)

    approx, count = jax.jit(lambda m: p2._first_k_true(m, k))(mask)
    approx, count = np.asarray(approx), np.asarray(count)

    recs = []
    for i in range(s):
        c = min(int(count[i]), k)
        if c == 0:
            continue
        ex = set(exact[i][exact[i] < n][:c].tolist())
        got = set(approx[i][:c].tolist())
        recs.append(len(ex & got) / max(len(ex), 1))
    return float(np.mean(recs)), float(np.min(recs)), len(recs)


def main():
    print(f"backend={jax.default_backend()} "
          f"approx_min_n={p2._APPROX_MIN_N} g={p2._INTERLEAVE_G}")
    for kind in ("sorted", "scan", "uniform"):
        mean_r, min_r, rows = recall_for(kind)
        print(f"{kind:8s} n=16384 s=4096 k=32: mean recall {mean_r:.4f} "
              f"min {min_r:.4f} over {rows} non-empty rows")


if __name__ == "__main__":
    main()
