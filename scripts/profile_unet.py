#!/usr/bin/env python
"""Coarse per-section timing of the flagship seresnext101 UNet forward
(bench methodology: on-device fori_loop, perturbed input, differenced)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from flax import linen as nn

from lyft3d_tpu.models.backbones import build_backbone
from lyft3d_tpu.models.layers import ASPP, ConvNormAct, UpBlock, resize_to
from lyft3d_tpu.models import build_model

B = 8
HW = 336
ITERS = 20


def timed(name, module_apply, *args):
    def rep(args, iters):
        def body(i, acc):
            out = module_apply(args[0], args[1] + i.astype(args[1].dtype) * 1e-6, *args[2:])
            return acc + jax.tree_util.tree_reduce(
                lambda s, a: s + jnp.sum(jnp.abs(a).astype(jnp.float32)), out, 0.0
            )

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
    print(f"{name}: {(tb - ta) / ITERS * 1000:.2f} ms/iter (batch {B})", flush=True)


class DecoderOnly(nn.Module):
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, f0, f1, f2, f3):
        feats = [f0, f1, f2, f3]
        skips = [
            ConvNormAct(max(f.shape[-1] // 4, 64), kernel=1, dtype=self.dtype)(f)
            for f in feats[:3]
        ]
        center = ASPP(256, dtype=self.dtype)(feats[3])
        d = center
        outs = []
        for skip in reversed(skips):
            d = UpBlock(64, dtype=self.dtype)(d, skip)
            outs.append(d)
        d = UpBlock(64, dtype=self.dtype)(d, None)
        outs.append(d)
        hyper = jnp.concatenate([resize_to(o, d.shape[1:3]) for o in outs], -1)
        h = ConvNormAct(64, dtype=self.dtype)(hyper)
        h = resize_to(h, (HW, HW))
        return nn.Conv(10, (1, 1), dtype=jnp.float32)(h)


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, HW, HW, 6), jnp.float32)

    model = build_model("unet_seresnext101", n_classes=10, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(rng, x[:1])
    timed("full UNet", lambda p, xx: model.apply(p, xx), params, x)

    bb = build_backbone("seresnext101", dtype=jnp.bfloat16)
    bparams = jax.jit(bb.init)(rng, x[:1])
    timed("backbone", lambda p, xx: bb.apply(p, xx), bparams, x)

    feats = jax.jit(bb.apply)(bparams, x)
    print("stage shapes:", [f.shape for f in feats], flush=True)
    dec = DecoderOnly()
    dparams = jax.jit(dec.init)(rng, *[f[:1] for f in feats])
    timed("decoder+aspp+head", lambda p, a, b_, c, d: dec.apply(p, a, b_, c, d),
          dparams, *feats)


if __name__ == "__main__":
    main()
