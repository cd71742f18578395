#!/usr/bin/env python
"""Microbenchmark: bf16 vs int8 matmul rates on the real TPU chip.

The axon tunnel costs ~3 ms per dispatch, so single-op timing is
useless; instead each measurement chains INNER_ITERS dependent matmuls
inside ONE jitted program (requantizing the output back into the next
input, the exact production int8 pattern) and divides.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

INNER = 512


def timed_once(fn, *args):
    jax.block_until_ready(fn(*args))  # compile

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


def bench_square(M, K):
    """Chained [M,K]x[K,K] matmuls."""
    rs = np.random.RandomState(0)
    flops = 2 * M * K * K
    w16 = jnp.asarray(rs.randn(K, K), jnp.bfloat16) * 0.01
    a16 = jnp.asarray(rs.randn(M, K), jnp.bfloat16)

    @jax.jit
    def chain16(a):
        def body(i, c):
            o = jnp.dot(c, w16, preferred_element_type=jnp.float32)
            return (o * 0.01).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, INNER, body, a)

    t16 = timed_once(chain16, a16)

    w8 = jnp.asarray(rs.randint(-127, 127, (K, K)), jnp.int8)
    a8 = jnp.asarray(rs.randint(-127, 127, (M, K)), jnp.int8)

    @jax.jit
    def chain8(a):
        def body(i, c):
            o = jax.lax.dot_general(c, w8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(o // 1024, -127, 127).astype(jnp.int8)
        return jax.lax.fori_loop(0, INNER, body, a)

    t8 = timed_once(chain8, a8)

    # Pallas int8 matmul + requant, tiled.
    TM = min(1024, M)
    TN = min(512, K)

    def kern(a_ref, b_ref, o_ref):
        acc = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = jnp.clip(acc // 1024, -127, 127).astype(jnp.int8)

    def pmm(a):
        return pl.pallas_call(
            kern,
            grid=(M // TM, K // TN),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, K), jnp.int8),
        )(a, w8)

    @jax.jit
    def chain8p(a):
        def body(i, c):
            return pmm(c)
        return jax.lax.fori_loop(0, INNER, body, a)

    try:
        t8p = timed_once(chain8p, a8)
    except Exception as e:  # noqa: BLE001
        print(f"  pallas failed: {type(e).__name__}: {e}")
        t8p = float("inf")

    def tf(t):
        return flops / t / 1e12

    print(f"[{M}x{K}x{K}] bf16 {t16*1e6:7.1f}us {tf(t16):6.1f}T | "
          f"int8-xla {t8*1e6:7.1f}us {tf(t8):6.1f}T | "
          f"int8-pallas {t8p*1e6:7.1f}us {tf(t8p):6.1f}T")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_square(16384, 512)
    bench_square(16384, 1024)
    bench_square(65536, 256)
    bench_square(4096, 2048)
