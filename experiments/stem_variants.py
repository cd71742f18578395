#!/usr/bin/env python
"""Stem experiments: 7x7 s2 conv + maxpool vs space-to-depth variants.

The classic stem is layout-hostile on TPU: a 3-channel input wastes
125/128 MXU lanes and the 256^2x64 intermediate is pure bandwidth.
Space-to-depth folds 4x4 pixel blocks into 48 channels so the first
conv runs at 128^2 with a dense channel dim.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tao_amodal_tpu.models.backbones import ConvBN

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


def space_to_depth(x, block=4):
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h // block, w // block, block * block * c)


class ClassicStem(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ConvBN(64, (7, 7), strides=2, dtype=DT)(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


class S2DStem(nn.Module):
    """4x4 space-to-depth then a 3x3 conv at the pooled resolution."""

    @nn.compact
    def __call__(self, x):
        x = space_to_depth(x, 4)          # [T, 128, 128, 48]
        return ConvBN(64, (3, 3), dtype=DT)(x)


class S2DStemBig(nn.Module):
    """2x2 space-to-depth + 4x4 s2 conv (keeps a 7x7-ish receptive
    field at the original scale) + 2x2 s2d instead of maxpool."""

    @nn.compact
    def __call__(self, x):
        x = space_to_depth(x, 2)          # [T, 256, 256, 12]
        x = ConvBN(64, (4, 4), strides=2, dtype=DT)(x)  # [T,128,...]
        return x


def chain(module, x_shape):
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(*x_shape), DT)
    variables = module.init(rng, x)

    @jax.jit
    def run(x0):
        def body(i, c):
            out = module.apply(variables, c)
            return c + 1e-6 * out.mean()
        return jax.lax.fori_loop(0, INNER, body, x0)

    return timed_once(run, x)


def main():
    print("devices:", jax.devices())
    t = chain(ClassicStem(), (T, 512, 512, 3))
    print(f"classic 7x7s2+maxpool : {t*1e3:7.3f} ms/clip")
    t = chain(S2DStem(), (T, 512, 512, 3))
    print(f"s2d4 + 3x3            : {t*1e3:7.3f} ms/clip")
    t = chain(S2DStemBig(), (T, 512, 512, 3))
    print(f"s2d2 + 4x4s2          : {t*1e3:7.3f} ms/clip")


if __name__ == "__main__":
    main()


class PreS2DStem(nn.Module):
    """Input already in s2d layout (preproc emits it): [T,128,128,48]."""

    @nn.compact
    def __call__(self, x):
        return ConvBN(64, (3, 3), dtype=DT)(x)


def main2():
    print("devices:", jax.devices())
    t = chain(PreS2DStem(), (T, 128, 128, 48))
    print(f"pre-s2d 3x3 (input 128^2x48): {t*1e3:7.3f} ms/clip")
    t = chain(PreS2DStem(), (T, 128, 128, 128))
    print(f"pre-s2d 3x3 (input 128^2x128 padded): {t*1e3:7.3f} ms/clip")


if __name__ == "__main__":
    main2()
