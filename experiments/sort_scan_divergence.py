#!/usr/bin/env python
"""Diagnose the compiled-vs-interpret divergence of the whole-clip
Pallas SORT kernel (the on-chip A/B found integer mismatches that the
interpret-mode parity tests do not show).

Runs the SAME kernel twice on the SAME input — interpret=True vs
compiled — and reports the first frame where ids/report diverge, plus
the live Kalman-state deltas, to distinguish a Mosaic precision effect
(near-tie argmax flips cascading through sequential id allocation)
from a miscompile (wrong values from frame 0).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

from tao_amodal_tpu.ops.pallas.sort_scan import sort_scan_pallas, sort_scan
from tao_amodal_tpu.trackers.sort import init_sort

T, D, K = 16, 64, 128


def scene(seed):
    rng = np.random.RandomState(seed)
    boxes = rng.uniform(0, 480, (T, D, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(8, 64, (T, D, 2))
    valid = rng.rand(T, D) < 0.3
    return jnp.asarray(boxes), jnp.asarray(valid)


def main():
    print(f"platform={jax.devices()[0].platform}")
    s0 = init_sort(max_tracks=K)
    for seed in range(4):
        b, v = scene(seed)
        st_i, (ids_i, rep_i) = sort_scan_pallas(s0, b, v, interpret=True)
        st_c, (ids_c, rep_c) = sort_scan_pallas(s0, b, v, interpret=False)
        st_x, (ids_x, _) = sort_scan(s0, b, v, impl="xla",
                                     assignment="greedy")
        ids_i, ids_c, ids_x = map(np.asarray, (ids_i, ids_c, ids_x))
        diff_ci = (ids_c != ids_i).sum(axis=1)  # per-frame mismatches
        diff_xi = (ids_x != ids_i).sum(axis=1)
        first = int(np.argmax(diff_ci > 0)) if diff_ci.any() else -1
        print(f"seed {seed}: compiled-vs-interpret per-frame id "
              f"mismatches {diff_ci.tolist()} first={first}; "
              f"xla-vs-interpret {diff_xi.sum()}")
        live = np.asarray(st_i.alive)
        dx = np.abs(np.asarray(st_c.x) - np.asarray(st_i.x))[live]
        print(f"  live-state |dx| max={dx.max() if dx.size else 0:.3e} "
              f"next_id interp={int(st_i.next_id)} "
              f"compiled={int(st_c.next_id)} xla={int(st_x.next_id)}")
        if first >= 0:
            t = first
            d = np.where(ids_c[t] != ids_i[t])[0]
            print(f"  frame {t}: diverging det rows {d[:8].tolist()} "
                  f"interp_ids={ids_i[t][d[:8]].tolist()} "
                  f"compiled_ids={ids_c[t][d[:8]].tolist()}")


if __name__ == "__main__":
    main()
