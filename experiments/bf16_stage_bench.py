#!/usr/bin/env python
"""bf16 fused identity-bottleneck Pallas stacks vs XLA flax stages.

Per ResNet-50 trunk stage (identity blocks only, T=16 frames at 512^2
base res with the s2d stride-4 stem):
  stage2: 2 identity blocks @128^2, C=256,  M=64
  stage3: 3 identity blocks @64^2,  C=512,  M=128
  stage4: 5 identity blocks @32^2,  C=1024, M=256
  stage5: 2 identity blocks @16^2,  C=2048, M=512
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

from tao_amodal_tpu.models.backbones import Bottleneck
from tao_amodal_tpu.ops.pallas.resnet_blocks import (
    Bf16BlockParams,
    identity_blocks_bf16_pallas,
)

INNER = 32
T = 16


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


def rand_params(rs, n, c, m):
    def w(*shape):
        return jnp.asarray(rs.randn(*shape) * 0.03, jnp.bfloat16)

    def f(*shape):
        return jnp.asarray(rs.uniform(0.5, 1.5, shape), jnp.float32)

    return Bf16BlockParams(
        w1=w(n, c, m), g1=f(n, m), b1=f(n, m) - 1.0,
        w2=w(n, 3, 3, m, m), g2=f(n, m), b2=f(n, m) - 1.0,
        w3=w(n, m, c), g3=f(n, c), b3=f(n, c) - 1.0)


def bench_stage(name, n, hw, c, m):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(T, hw, hw, c), jnp.bfloat16)
    p = rand_params(rs, n, c, m)

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, xx):
            for _ in range(n):
                xx = Bottleneck(m, dtype=jnp.bfloat16)(xx)
            return xx

    stack = Stack()
    variables = stack.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def chain_bf16(x0):
        def body(i, cr):
            out = stack.apply(variables, cr)
            return cr + out * jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, INNER, body, x0)

    t_x = timed_once(chain_bf16, x)

    @jax.jit
    def chain_pallas(x0):
        def body(i, cr):
            out = identity_blocks_bf16_pallas(cr, p)
            return cr + out * jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, INNER, body, x0)

    try:
        t_p = timed_once(chain_pallas, x)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: pallas FAIL: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")
        t_p = float("inf")

    print(f"{name}: bf16-xla {t_x*1e3:7.3f} ms | "
          f"bf16-pallas {t_p*1e3:7.3f} ms  (per {T}-frame clip)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_stage("stage3 (3 idblk, 64^2, C512) ", 3, 64, 512, 128)
    bench_stage("stage4 (5 idblk, 32^2, C1024)", 5, 32, 1024, 256)
    bench_stage("stage5 (2 idblk, 16^2, C2048)", 2, 16, 2048, 512)
    bench_stage("stage2 (2 idblk, 128^2, C256)", 2, 128, 256, 64)
