#!/usr/bin/env python
"""FPN cost dissection on the real chip: laterals, top-down merge,
post convs, extra levels — cumulative, inside one jitted graph."""

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

INNER = 16
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


def chain(fn, x):
    @jax.jit
    def run(x0):
        def body(i, c):
            out = fn(c)
            leaves = jax.tree_util.tree_leaves(out)
            eps = sum(l.astype(jnp.float32).mean() for l in leaves)
            return c + (eps * 1e-6).astype(c.dtype)
        return jax.lax.fori_loop(0, INNER, body, x0)

    return timed_once(run, x)


class FPNStaged(nn.Module):
    stage: str = "full"
    features: int = 256

    @nn.compact
    def __call__(self, inputs):
        laterals = [
            nn.Conv(self.features, (1, 1), dtype=DT,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        if self.stage == "lateral":
            return laterals
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(
                laterals[i + 1], laterals[i].shape, method="nearest")
            laterals[i] = laterals[i] + up
        if self.stage == "merge":
            return laterals
        outs = [
            nn.Conv(self.features, (3, 3), padding="SAME", dtype=DT,
                    name=f"post_{i}")(x)
            for i, x in enumerate(laterals)
        ]
        if self.stage == "post":
            return outs
        x = outs[-1]
        for j in range(2):
            x = nn.Conv(self.features, (3, 3), strides=2,
                        padding="SAME", dtype=DT, name=f"extra_{j}")(x)
            outs.append(x)
        return outs


def main():
    print("devices:", jax.devices())
    rs = np.random.RandomState(0)
    feats = [jnp.asarray(rs.rand(T, 64, 64, 512), DT),
             jnp.asarray(rs.rand(T, 32, 32, 1024), DT),
             jnp.asarray(rs.rand(T, 16, 16, 2048), DT)]

    prev = 0.0
    for stage in ("lateral", "merge", "post", "full"):
        mod = FPNStaged(stage=stage)
        variables = mod.init(jax.random.PRNGKey(0),
                             [f[:1] for f in feats])
        t = chain(lambda f0: mod.apply(variables, [f0] + feats[1:]),
                  feats[0]) * 1e3
        print(f"cum {stage:8s}: {t:7.3f} ms/clip (delta {t-prev:+7.3f})")
        prev = t


if __name__ == "__main__":
    main()
