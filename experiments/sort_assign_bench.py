#!/usr/bin/env python
"""SORT association variants on the real chip: auction (default),
gated auction (floor near the IoU gate, coarser eps), greedy
mutual-best."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tao_amodal_tpu.trackers.sort import init_sort, sort_step
from tao_amodal_tpu.ops.hungarian import auction_assign, greedy_assign

INNER = 16
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


def make_sort_fn(assignment):
    det_valid = None

    def sort_fn(b0, det_valid):
        state = init_sort(max_tracks=128)

        def assoc(state, frame):
            bx, vl = frame
            state, out = sort_step(state, bx, vl,
                                   assignment=assignment)
            return state, out["det_track_id"]

        _, tids = jax.lax.scan(assoc, state, (b0, det_valid))
        return tids

    return sort_fn


def main():
    print("devices:", jax.devices())
    rs = np.random.RandomState(0)
    det_boxes = jnp.asarray(rs.rand(T, 64, 4) * 500, jnp.float32)
    det_boxes = det_boxes.at[..., 2:].set(det_boxes[..., :2] + 30)
    det_valid = jnp.asarray(rs.rand(T, 64) > 0.3)

    for name in ("auction", "gated_auction", "greedy"):
        fn = make_sort_fn(name)

        def chained(b0):
            @jax.jit
            def run(b):
                def body(i, c):
                    tids = fn(b + c * 1e-6, det_valid)
                    return c + tids.astype(jnp.float32).mean() * 1e-6
                return jax.lax.fori_loop(0, INNER, body,
                                         jnp.zeros(()))
            return timed_once(run, b0)

        try:
            t = chained(det_boxes)
            print(f"SORT scan [{name:14s}]: {t*1e3:7.3f} ms/clip")
        except Exception as e:  # noqa: BLE001
            print(f"SORT scan [{name}]: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:80]}")


if __name__ == "__main__":
    main()


def variant_bench():
    """Tuning: coarser eps; fixed-round fori instead of while."""
    import functools

    from tao_amodal_tpu.ops.hungarian import NEG

    rs = np.random.RandomState(0)
    det_boxes = jnp.asarray(rs.rand(T, 64, 4) * 500, jnp.float32)
    det_boxes = det_boxes.at[..., 2:].set(det_boxes[..., :2] + 30)
    det_valid = jnp.asarray(rs.rand(T, 64) > 0.3)

    def greedy_fixed(benefit, rounds=12):
        n, m = benefit.shape
        b0 = jnp.where(benefit > NEG / 2,
                       benefit.astype(jnp.float32), NEG)

        def body(_, carry):
            b, r2c = carry
            best_col = jnp.argmax(b, axis=1)
            best_val = jnp.max(b, axis=1)
            best_row = jnp.argmax(b, axis=0)
            mutual = ((best_row[best_col] == jnp.arange(n))
                      & (best_val > NEG / 2))
            r2c = jnp.where(mutual, best_col.astype(jnp.int32), r2c)
            col_taken = jnp.zeros((m,), bool).at[
                jnp.where(mutual, best_col, m)].set(True, mode="drop")
            b = jnp.where(mutual[:, None] | col_taken[None, :], NEG, b)
            return b, r2c

        _, r2c = jax.lax.fori_loop(
            0, rounds, body, (b0, jnp.full((n,), -1, jnp.int32)))
        return r2c

    from tao_amodal_tpu.ops import kalman
    from tao_amodal_tpu.trackers.sort import SortState, _iou_matrix

    def scan_with(assign_fn):
        def sort_fn(b0, det_valid):
            state = init_sort(max_tracks=128)

            def assoc(state, frame):
                bx, vl = frame
                # inline the association-only part: predict + assign
                x_pred, P_pred = kalman.predict(state.x, state.P)
                trk_boxes = kalman.state_to_bbox(x_pred)
                iou = _iou_matrix(bx, trk_boxes)
                benefit = jnp.where(
                    vl[:, None] & state.alive[None, :], iou, NEG)
                r2c = assign_fn(benefit)
                # trivial state update to carry dependency
                alive = state.alive | (jnp.sum(r2c) > -10000)
                state = state._replace(x=x_pred, P=P_pred, alive=alive)
                return state, r2c

            _, tids = jax.lax.scan(assoc, state, (b0, det_valid))
            return tids

        return sort_fn

    for name, fn in (
        ("auction eps5e-3 gate", functools.partial(
            auction_assign, eps=5e-3, floor=0.24)),
        ("greedy fixed-12 fori", greedy_fixed),
        ("greedy while", greedy_assign),
    ):
        sort_fn = scan_with(fn)

        @jax.jit
        def run(b):
            def body(i, c):
                tids = sort_fn(b + c * 1e-6, det_valid)
                return c + tids.astype(jnp.float32).mean() * 1e-6
            return jax.lax.fori_loop(0, INNER, body, jnp.zeros(()))

        t = timed_once(run, det_boxes)
        print(f"assoc-only scan [{name:20s}]: {t*1e3:7.3f} ms/clip")


if __name__ == "__main__":
    variant_bench()
