#!/usr/bin/env python
"""Where does the ResNet-50 trunk time go?  Per-stage chained timing on
the real chip (bf16, 16-frame 512x512 clip), plus the FPN/RPN heads."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tao_amodal_tpu.models.backbones import ResNet, Bottleneck, ConvBN

INNER = 32
T = 16
DT = jnp.bfloat16


def timed_once(fn, *args):
    jax.block_until_ready(fn(*args))

    @jax.jit
    def tiny(x):
        return x + 1.0

    float(tiny(jnp.zeros((), jnp.float32)))

    def roundtrip():
        s = time.perf_counter()
        float(tiny(jnp.zeros((), jnp.float32)))
        return time.perf_counter() - s

    rt = min(roundtrip() for _ in range(3))

    def block():
        s = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).astype(jnp.float32).ravel()[0])
        return time.perf_counter() - s

    return (sorted(block() for _ in range(5))[2] - rt) / INNER


def chain(module, x_shape, train=False):
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(*x_shape), DT)
    variables = module.init(rng, x)

    @jax.jit
    def run(x0):
        def body(i, c):
            out = module.apply(variables, c)
            if isinstance(out, (list, tuple)):
                out = out[-1]
            # feed a same-shaped perturbation back to keep dependency
            return c + 1e-6 * out.mean()
        return jax.lax.fori_loop(0, INNER, body, x0)

    return timed_once(run, x)


def main():
    print("devices:", jax.devices())

    import flax.linen as nn

    class StemMod(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ConvBN(64, (7, 7), strides=2, dtype=DT)(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

    class StageMod(nn.Module):
        features: int
        blocks: int
        stride: int

        @nn.compact
        def __call__(self, x):
            for i in range(self.blocks):
                x = Bottleneck(self.features,
                               strides=self.stride if i == 0 else 1,
                               downsample=(i == 0), dtype=DT)(x)
            return x

    t = chain(StemMod(), (T, 512, 512, 3))
    print(f"stem (7x7s2+pool)            : {t*1e3:7.3f} ms/clip")
    t = chain(StageMod(64, 3, 1), (T, 128, 128, 64))
    print(f"stage1 3 blocks @128^2x256   : {t*1e3:7.3f} ms/clip")
    t = chain(StageMod(128, 4, 2), (T, 128, 128, 256))
    print(f"stage2 4 blocks @64^2x512    : {t*1e3:7.3f} ms/clip")
    t = chain(StageMod(256, 6, 2), (T, 64, 64, 512))
    print(f"stage3 6 blocks @32^2x1024   : {t*1e3:7.3f} ms/clip")
    t = chain(StageMod(512, 3, 2), (T, 32, 32, 1024))
    print(f"stage4 3 blocks @16^2x2048   : {t*1e3:7.3f} ms/clip")

    full = ResNet(stage_sizes=(3, 4, 6, 3), out_stages=(2, 3, 4), dtype=DT)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(T, 512, 512, 3), DT)
    variables = full.init(rng, x)

    @jax.jit
    def run_full(x0):
        def body(i, c):
            outs = full.apply(variables, c)
            return c + 1e-6 * outs[-1].mean()
        return jax.lax.fori_loop(0, INNER, body, x0)

    t = timed_once(run_full, x)
    print(f"FULL trunk                   : {t*1e3:7.3f} ms/clip")


if __name__ == "__main__":
    main()
