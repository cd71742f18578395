#!/usr/bin/env python
"""Flagship benchmark: detect+expand+track frames/sec/chip on TPU.

Runs the full AmodalPipeline (ResNet-50 detector + FPN + RPN + RoI
heads + AmodalExpander + SORT association) on synthetic clips at the
TAO-Amodal working resolution and reports end-to-end throughput on the
real chip.  Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "frames/sec/chip",
     "vs_baseline": N}

vs_baseline is against BASELINE.json's 2000 f/s/chip target.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tao_amodal_tpu.pipeline import AmodalPipeline

    on_tpu = any(d.platform == "tpu" for d in jax.devices())

    # Production-shape config: ResNet-50 trunk, bf16 compute on TPU.
    T, H, W = 16, 512, 512
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    pipeline = AmodalPipeline.create(
        num_classes=80, num_dets=64, num_proposals=256,
        backbone_stages=(3, 4, 6, 3), dtype=dtype)

    rng = jax.random.PRNGKey(0)
    clip = jnp.asarray(
        np.random.RandomState(0).rand(T, H, W, 3).astype(np.float32))
    variables = pipeline.init(rng, clip[:2])

    @jax.jit
    def run(clip):
        return pipeline(variables, clip)

    # Compile + warm up.
    out = run(clip)
    jax.block_until_ready(out)

    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        out = run(clip)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    frames_per_sec = iters * T / elapsed
    baseline = 2000.0  # BASELINE.json north-star target
    print(json.dumps({
        "metric": "frames/sec/chip (detect+expand+track, "
                  f"{H}x{W} r50-fpn, {'tpu' if on_tpu else 'cpu'})",
        "value": round(frames_per_sec, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / baseline, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
