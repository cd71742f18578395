#!/usr/bin/env python
"""Round-4 bf16 fused bottleneck-chain vs XLA convs, production shapes.

Isolates the trunk stages at the 4:3 serving geometry (384x512 input,
s2d stem -> 96x128 stage-1 plane) and times the XLA conv chain against
``fused_bottleneck_chain`` across row-tile sizes.  The stage-level
numbers decide bench.py's ``--fused_stages`` default.

Stage shapes (T=16 frames):
  stage1: 3 blocks (block0 ds 64->256),  96x128, M=64
  stage2: 3-block identity tail,         48x64,  C=512,  M=128
  stage3: 5-block identity tail,         24x32,  C=1024, M=256
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tao_amodal_tpu.ops.pallas.fused_stage import (
    _chain_tile_rows,
    bottleneck_chain_reference,
    fused_bottleneck_chain,
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


def rand_params(rs, n_blocks, cin, m, first_ds):
    params = []
    c = cin
    for i in range(n_blocks):
        p = dict(
            wa=jnp.asarray(rs.randn(1, 1, c, m) * 0.05, jnp.float32),
            ba=jnp.asarray(rs.randn(m) * 0.01, jnp.float32),
            w3=jnp.asarray(rs.randn(3, 3, m, m) * 0.05, jnp.float32),
            b3=jnp.asarray(rs.randn(m) * 0.01, jnp.float32),
            wb=jnp.asarray(rs.randn(1, 1, m, 4 * m) * 0.05,
                           jnp.float32),
            bb=jnp.asarray(rs.randn(4 * m) * 0.01, jnp.float32),
        )
        if i == 0 and first_ds:
            p["wd"] = jnp.asarray(rs.randn(1, 1, c, 4 * m) * 0.05,
                                  jnp.float32)
            p["bd"] = jnp.asarray(rs.randn(4 * m) * 0.01, jnp.float32)
        params.append(p)
        c = 4 * m
    return params


def bench_stage(name, n_blocks, h, w, cin, m, first_ds):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(T, h, w, cin) * 0.5, jnp.bfloat16)
    params = rand_params(rs, n_blocks, cin, m, first_ds)

    def chain(fn):
        @jax.jit
        def run(x0):
            def body(i, cr):
                out = fn(cr[..., :cin].astype(jnp.bfloat16))
                pad = cin - out.shape[-1] if out.shape[-1] < cin else 0
                if out.shape[-1] > cin:
                    out = out[..., :cin]
                elif pad:
                    out = jnp.pad(out,
                                  ((0, 0),) * 3 + ((0, pad),))
                return (cr + out * jnp.bfloat16(1e-6)).astype(
                    jnp.bfloat16)
            return jax.lax.fori_loop(0, INNER, body, x0)
        return run

    t_xla = timed_once(chain(
        lambda v: bottleneck_chain_reference(v, params)), x)
    auto_s = _chain_tile_rows(h, w, cin, m, n_blocks, 2)
    line = (f"{name}: xla {t_xla*1e3:6.3f} ms | auto S={auto_s}")
    for cap in (None, 8, 6):
        try:
            t = timed_once(chain(
                lambda v, c=cap: fused_bottleneck_chain(
                    v, params, tile_rows=c)), x)
            line += f" | fused(S<={cap or 'auto'}) {t*1e3:6.3f} ms"
        except Exception as e:  # noqa: BLE001
            line += (f" | fused(S<={cap or 'auto'}) FAIL "
                     f"{type(e).__name__}: "
                     f"{str(e).splitlines()[0][:80]}")
    print(line)


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_stage("stage1 (3 blk ds, 96x128, 64->256)",
                3, 96, 128, 64, 64, True)
    bench_stage("stage2 tail (3 blk, 48x64, C512)  ",
                3, 48, 64, 512, 128, False)
    bench_stage("stage3 tail (5 blk, 24x32, C1024) ",
                5, 24, 32, 1024, 256, False)
