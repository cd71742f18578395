#!/usr/bin/env python
"""Dissect the expander+SORT block (~0.71 ms/clip in the round-5
in-graph breakdown): what does the SORT scan itself cost, and how much
of it is the dynamic-trip-count ``while_loop`` inside greedy_assign
(a serialization point XLA cannot pipeline across unrolled frames)?

Programs timed (production shapes: T=16, D=64 dets, K=128 slots):
  - sort_scan:        the pipeline's exact scan (greedy, unroll=16)
  - sort_scan_u1:     unroll=1 (is full unroll actually winning?)
  - sort_fixed{N}:    greedy with the while_loop replaced by N
                      UNROLLED mutual-best rounds (semantics: equal to
                      greedy iff it converges within N rounds; this is
                      a measurement probe, not a shipped variant)
  - assoc only / kalman only: the two halves of sort_step

Isolation-bench caveat (BENCH_NOTES round-5 fused-chain lesson): these
standalone numbers bound the lever; any shipped change must be
re-measured end-to-end in bench.py before a verdict.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.ops import kalman
from tao_amodal_tpu.ops.hungarian import NEG
from tao_amodal_tpu.trackers.sort import (
    _iou_matrix,
    init_sort,
    sort_step,
)

T, D, K = 16, 64, 128
ITERS = 50


def greedy_fixed_rounds(benefit, rounds):
    """greedy_assign with the while_loop unrolled to a fixed count."""
    n, m = benefit.shape
    b = jnp.where(benefit > NEG / 2, benefit.astype(jnp.float32), NEG)
    r2c = jnp.full((n,), -1, jnp.int32)
    for _ in range(rounds):
        best_col = jnp.argmax(b, axis=1)
        best_val = jnp.max(b, axis=1)
        best_row = jnp.argmax(b, axis=0)
        mutual = ((best_row[best_col] == jnp.arange(n))
                  & (best_val > NEG / 2))
        r2c = jnp.where(mutual, best_col.astype(jnp.int32), r2c)
        col_taken = jnp.zeros((m,), bool).at[
            jnp.where(mutual, best_col, m)].set(True, mode="drop")
        b = jnp.where(mutual[:, None] | col_taken[None, :], NEG, b)
    return r2c


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        runs.append((time.perf_counter() - t0) / ITERS)
    return sorted(runs)[2]


def main():
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(
        rng.uniform(0, 400, (T, D, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 20)
    valid = jnp.asarray(rng.rand(T, D) > 0.3)
    state0 = init_sort(max_tracks=K)

    @jax.jit
    def scan_u16(bx, vl):
        def assoc(s, frame):
            b, v = frame
            s, out = sort_step(s, b, v, max_age=5, min_hits=1,
                               assignment="greedy")
            return s, out["det_track_id"]

        s, ids = jax.lax.scan(assoc, state0, (bx, vl), unroll=16)
        return ids

    @jax.jit
    def scan_u1(bx, vl):
        def assoc(s, frame):
            b, v = frame
            s, out = sort_step(s, b, v, max_age=5, min_hits=1,
                               assignment="greedy")
            return s, out["det_track_id"]

        s, ids = jax.lax.scan(assoc, state0, (bx, vl), unroll=1)
        return ids

    def make_patched(rounds):
        """The FULL pipeline scan (state threaded, exact sort_step
        semantics) with greedy_assign's while_loop swapped for a
        fixed unrolled round count — isolates the dynamic-trip-count
        serialization cost inside the real program."""
        import tao_amodal_tpu.trackers.sort as sort_mod

        # sort_step is itself jitted (its cached trace would keep the
        # original greedy_assign); trace the UNJITTED function while
        # the patch is active.
        raw_step = sort_mod.sort_step.__wrapped__
        orig = sort_mod.greedy_assign
        sort_mod.greedy_assign = partial(greedy_fixed_rounds,
                                         rounds=rounds)
        try:
            @jax.jit
            def scan_fixed(bx, vl):
                def assoc(s, frame):
                    b, v = frame
                    s, out = raw_step(s, b, v, max_age=5, min_hits=1,
                                      assignment="greedy")
                    return s, out["det_track_id"]

                s, ids = jax.lax.scan(assoc, state0, (bx, vl),
                                      unroll=16)
                return ids

            # Force trace+compile while the patch is active.
            scan_fixed(boxes, valid).block_until_ready()
        finally:
            sort_mod.greedy_assign = orig
        return scan_fixed

    results = {}
    results["sort_scan_u16_ms"] = timed(scan_u16, boxes, valid) * 1e3
    results["sort_scan_u1_ms"] = timed(scan_u1, boxes, valid) * 1e3
    fixed8 = make_patched(8)
    results["sort_scan_fixed8_ms"] = timed(fixed8, boxes, valid) * 1e3
    # Fixed-8 must agree with the while_loop greedy on this input
    # (the chain converges in <5 rounds here) or the timing is moot.
    agree = bool(jnp.all(fixed8(boxes, valid)
                         == scan_u16(boxes, valid)))
    results["fixed8_matches_exact"] = float(agree)
    for k, v in results.items():
        print(f"{k}: {v:.3f}")


if __name__ == "__main__":
    main()
