#!/usr/bin/env python
"""Microbenchmark grouped-conv formulations at SE-ResNeXt stage shapes."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30


def timed(name, fn, *args):
    def rep(args, iters):
        def body(i, acc):
            out = fn(args[0] + i.astype(args[0].dtype) * 1e-6, *args[1:])
            return acc + jnp.sum(jnp.abs(out).astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(rep, static_argnums=(1,))
    float(f(args, 1))
    float(f(args, 1 + ITERS))
    t0 = time.perf_counter()
    float(f(args, 1))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(args, 1 + ITERS))
    tb = time.perf_counter() - t0
    print(f"  {name}: {(tb - ta) / ITERS * 1e6:.0f} us/iter", flush=True)
    return (tb - ta) / ITERS


def xla_grouped(x, w, g):
    # w: (3, 3, cin/g, cout)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", feature_group_count=g,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def packed_dense(x, w, g):
    kh, kw, cing, cout = w.shape
    cin = cing * g
    k5 = w.reshape(kh, kw, cing, g, cout // g)
    eye = jnp.eye(g, dtype=w.dtype)
    kd = jnp.einsum("hwigo,kg->hwkigo", k5, eye).reshape(kh, kw, cin, cout)
    return jax.lax.conv_general_dilated(
        x, kd, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def im2col_batched(x, w, g):
    """Per-group batched matmul: patches (g, 9*cing, M) @ w (g, 9*cing, outg)."""
    n, h, wd, cin = x.shape
    kh, kw, cing, cout = w.shape
    outg = cout // g
    # patches: (N, H, W, kh*kw*cin) with channel-fastest ordering
    pat = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )  # (N, H, W, cin*kh*kw)? ordering: spatial-major? verify below
    m = n * h * wd
    # patches feature order is channel-slowest: (cin, kh*kw)
    pat = pat.reshape(m, g, cing, kh * kw)
    pat = pat.transpose(1, 2, 3, 0).reshape(g, cing * kh * kw, m)
    wg = w.reshape(kh, kw, cing, g, outg).transpose(3, 2, 0, 1, 4).reshape(
        g, cing * kh * kw, outg
    )
    y = jax.lax.dot_general(
        wg, pat, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (g, outg, m)
    return y.astype(x.dtype).transpose(2, 0, 1).reshape(n, h, wd, cout)


def check(x, w, g):
    a = xla_grouped(x, w, g)
    b = im2col_batched(x, w, g)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(a).astype(jnp.float32)))
    print(f"  im2col max err: {err:.4f} (scale {scale:.1f})", flush=True)


def main():
    rng = np.random.RandomState(0)
    for (b, hw, cin, g) in [(8, 42, 256, 32), (8, 21, 512, 32), (8, 11, 1024, 32)]:
        cout = cin
        print(f"shape B{b} {hw}x{hw} c{cin} g{g}:", flush=True)
        x = jnp.asarray(rng.randn(b, hw, hw, cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, cin // g, cout) * 0.05, jnp.bfloat16)
        check(x, w, g)
        timed("xla_grouped ", partial(xla_grouped, g=g), x, w)
        timed("packed_dense", partial(packed_dense, g=g), x, w)
        timed("im2col_bmm  ", partial(im2col_batched, g=g), x, w)


if __name__ == "__main__":
    main()
