#!/usr/bin/env python
"""On-chip A/B: the whole-clip Pallas SORT kernel vs the XLA scan.

The round-5 in-graph breakdown puts expander+SORT at ~0.71 ms/clip and
the `sort_scan_bench.py` dissection shows the cost is exposed latency
of tiny dependent ops, not FLOPs.  `ops/pallas/sort_scan.py` runs the
entire clip inside one ``pallas_call``.  This script times both at the
production shape (T=16, D=64, K=128) in isolation, then the shipped
verdict comes from end-to-end `bench.py --sort_impl {xla,pallas}`
(BENCH_NOTES round-5 fused-chain lesson: isolation wins on
latency/memory-bound blocks must be confirmed in-graph).

Run on the TPU box: `python experiments/sort_scan_kernel_bench.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.ops.pallas.sort_scan import sort_scan
from tao_amodal_tpu.trackers.sort import init_sort

T, D, K = 16, 64, 128
ITERS = 100


def scene(seed):
    rng = np.random.RandomState(seed)
    boxes = rng.uniform(0, 480, (T, D, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(8, 64, (T, D, 2))
    valid = rng.rand(T, D) < 0.3
    return jnp.asarray(boxes), jnp.asarray(valid)


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    print(f"platform={jax.devices()[0].platform} T={T} D={D} K={K}")
    boxes, valid = scene(0)
    s0 = init_sort(max_tracks=K)

    for impl in ("xla", "pallas"):
        f = jax.jit(lambda st, b, v, impl=impl: sort_scan(
            st, b, v, max_age=1, min_hits=3, assignment="greedy",
            impl=impl))
        ms = timed(f, s0, boxes, valid)
        print(f"sort_scan[{impl:6s}]  {ms:7.3f} ms/clip")

    # Integer-output parity on-chip (the tests cover interpret mode;
    # this is the compiled-kernel check on real hardware).
    flips = 0
    for seed in range(4):
        b, v = scene(seed)
        _, (ia, ra) = jax.jit(lambda st, b, v: sort_scan(
            st, b, v, impl="xla"))(s0, b, v)
        _, (ip, rp) = jax.jit(lambda st, b, v: sort_scan(
            st, b, v, impl="pallas"))(s0, b, v)
        flips += int((np.asarray(ia) != np.asarray(ip)).sum())
        flips += int((np.asarray(ra) != np.asarray(rp)).sum())
    print(f"on-chip integer-output mismatches over 4 scenes: {flips}")


if __name__ == "__main__":
    main()
