#!/usr/bin/env python
"""End-to-end pipeline breakdown on the real chip.

Each measured fn is chained through the carry (the input tensor is
perturbed by a data-dependent epsilon of the previous output) so XLA
cannot hoist the body out of the timing loop.
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

from tao_amodal_tpu.pipeline import AmodalPipeline

INNER = 16
import os
T = 16
H = int(os.environ.get("BD_H", "512"))
W = int(os.environ.get("BD_W", "512"))
SRC_H = int(os.environ.get("BD_SRC_H", str(H)))
SRC_W = int(os.environ.get("BD_SRC_W", str(W)))
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


def chain_float(fn, x):
    """Carry the float input; perturb by 1e-6 * mean(output)."""

    @jax.jit
    def run(x0):
        def body(i, c):
            out = fn(c)
            leaves = jax.tree_util.tree_leaves(out)
            eps = sum(l.astype(jnp.float32).mean()
                      for l in leaves) * 1e-6
            return c + eps.astype(c.dtype)
        return jax.lax.fori_loop(0, INNER, body, x0)

    return timed_once(run, x)


def chain_uint8(fn, x):
    """Carry the uint8 input; XOR a data-dependent bit in."""

    @jax.jit
    def run(x0):
        def body(i, c):
            out = fn(c)
            leaves = jax.tree_util.tree_leaves(out)
            bit = (leaves[0].astype(jnp.float32).sum()
                   .astype(jnp.int32) & 1).astype(jnp.uint8)
            return c ^ bit
        return jax.lax.fori_loop(0, INNER, body, x0)

    return timed_once(run, x)


def main():
    print("devices:", jax.devices())
    pipeline = AmodalPipeline.create(
        num_classes=80, num_dets=64,
        num_proposals=int(os.environ.get("BD_PROPOSALS", "96")),
        pre_nms_topk=int(os.environ.get("BD_TOPK", "100")),
        backbone_stages=(3, 4, 6, 3), dtype=DT, stem="s2d_pre")
    det = pipeline.detector

    rs = np.random.RandomState(0)
    frames = jnp.asarray(rs.randint(0, 255, (T, SRC_H, SRC_W, 3), np.uint8))
    clip, _ = pipeline.preprocess(frames, out_size=(H, W))
    clip = clip.astype(DT)
    variables = jax.jit(pipeline.init)(jax.random.PRNGKey(0), clip)
    det_vars = variables["detector"]

    t = chain_uint8(lambda fr: pipeline.preprocess(fr, out_size=(H, W))[0],
                    frames)
    print(f"preproc (fused s2d)        : {t*1e3:7.3f} ms/clip")

    t = chain_float(lambda c: det.apply(
        det_vars, c, method=lambda m, x: m.backbone(x)), clip)
    print(f"backbone (r50, s2d stem)   : {t*1e3:7.3f} ms/clip")

    t = chain_float(lambda c: det.apply(
        det_vars, c, method=lambda m, x: m.features_for(x)), clip)
    print(f"backbone + FPN             : {t*1e3:7.3f} ms/clip")

    t = chain_float(lambda c: det.apply(det_vars, c), clip)
    print(f"detector (=2 + RPN/RoI/NMS): {t*1e3:7.3f} ms/clip")

    t = chain_float(lambda c: pipeline(variables, c), clip)
    print(f"pipeline (=3 + expand+SORT): {t*1e3:7.3f} ms/clip")


if __name__ == "__main__":
    main()
