#!/usr/bin/env python
"""Packed multilevel RoI pooling: XLA einsum form vs fused Pallas
kernel, on the real chip (T=16 frames, 128 rois, P3-P6 at 512^2)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tao_amodal_tpu.ops.roi import multilevel_roi_align

INNER = 16
T = 16
DT = jnp.bfloat16
STRIDES = (8, 16, 32, 64)


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


def chain(fn, x):
    @jax.jit
    def run(x0):
        def body(i, c):
            out = fn(c)
            eps = out.astype(jnp.float32).mean()
            return c + (eps * 1e-6).astype(c.dtype)
        return jax.lax.fori_loop(0, INNER, body, x0)

    return timed_once(run, x)


def main():
    print("devices:", jax.devices())
    rs = np.random.RandomState(0)
    sizes = [64, 32, 16, 8]
    pyramid = [jnp.asarray(rs.rand(T, s, s, 256), DT) for s in sizes]
    props = rs.rand(T, 128, 4).astype(np.float32) * 400
    props[..., 2:] = props[..., :2] + 30 + props[..., 2:] * 0.2
    props = jnp.asarray(props)

    for method in ("prroi_packed", "prroi_packed_pallas"):
        def pool_fn(p0, method=method):
            def per_frame(pyr_frame, pr):
                return multilevel_roi_align(
                    pyr_frame, pr, out_size=7, canonical_level=1,
                    strides=STRIDES, method=method)
            return jax.vmap(per_frame)([p for p in pyramid], p0)

        t = chain(pool_fn, props)
        print(f"{method:22s}: {t*1e3:7.3f} ms/clip")


if __name__ == "__main__":
    main()
