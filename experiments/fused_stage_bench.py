#!/usr/bin/env python
"""Fused int8 bottleneck stacks vs XLA bf16 stages on the real chip.

Per stage (identity blocks only, T=16 frames at 512^2 base res):
  stage1: 2 blocks @128^2, C=256, M=64
  stage2: 3 blocks @64^2,  C=512, M=128
  stage3: 5 blocks @32^2,  C=1024, M=256
  stage4: 2 blocks @16^2,  C=2048, M=512
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
    QuantBlockParams,
    identity_blocks_pallas,
    identity_blocks_reference,
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


def rand_qparams(rs, n, c, m):
    def w(*shape):
        return jnp.asarray(rs.randint(-127, 128, shape), jnp.int8)

    def f(*shape):
        return jnp.asarray(rs.uniform(1e-4, 3e-4, shape), jnp.float32)

    return QuantBlockParams(
        w1=w(n, c, m), s1=f(n, m), b1=f(n, m),
        w2=w(n, 3, 3, m, m), s2=f(n, m), b2=f(n, m),
        w3=w(n, m, c), s3=f(n, c), b3=f(n, c), res_scale=f(n))


def bench_stage(name, n, hw, c, m):
    rs = np.random.RandomState(0)
    x8 = jnp.asarray(rs.randint(0, 128, (T, hw, hw, c)), jnp.int8)
    qp = rand_qparams(rs, n, c, m)

    # XLA bf16 flax stack (the current trunk path).
    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(n):
                x = Bottleneck(m, dtype=jnp.bfloat16)(x)
            return x

    stack = Stack()
    x16 = x8.astype(jnp.bfloat16)
    variables = stack.init(jax.random.PRNGKey(0), x16)

    @jax.jit
    def chain_bf16(x0):
        def body(i, cr):
            out = stack.apply(variables, cr)
            return cr + out * jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, INNER, body, x0)

    t_bf16 = timed_once(chain_bf16, x16)

    @jax.jit
    def chain_pallas(x0):
        def body(i, cr):
            out = identity_blocks_pallas(cr, qp)
            return out
        return jax.lax.fori_loop(0, INNER, body, x0)

    try:
        t_pl = timed_once(chain_pallas, x8)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: pallas FAIL: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}")
        t_pl = float("inf")

    @jax.jit
    def chain_xla_int(x0):
        def body(i, cr):
            return identity_blocks_reference(cr, qp)
        return jax.lax.fori_loop(0, INNER, body, x0)

    try:
        t_xi = timed_once(chain_xla_int, x8)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: xla-int FAIL: {type(e).__name__}")
        t_xi = float("inf")

    print(f"{name}: bf16-xla {t_bf16*1e3:7.3f} ms | "
          f"int8-pallas {t_pl*1e3:7.3f} ms | "
          f"int8-xla {t_xi*1e3:7.3f} ms  (per {T}-frame clip)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_stage("stage2 (3 blk, 64^2, C512) ", 3, 64, 512, 128)
    bench_stage("stage3 (5 blk, 32^2, C1024)", 5, 32, 1024, 256)
    bench_stage("stage4 (2 blk, 16^2, C2048)", 2, 16, 2048, 512)
    bench_stage("stage1 (2 blk, 128^2, C256)", 2, 128, 256, 64)
