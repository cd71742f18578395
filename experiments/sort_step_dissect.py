#!/usr/bin/env python
"""Where does sort_step's time go? predict+assign vs +update vs full
lifecycle, scanned over 16 frames on the real chip."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tao_amodal_tpu.ops import kalman
from tao_amodal_tpu.ops.hungarian import NEG, auction_assign
from tao_amodal_tpu.trackers.sort import (
    _iou_matrix,
    init_sort,
    sort_step,
)

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


def main():
    print("devices:", jax.devices())
    rs = np.random.RandomState(0)
    det_boxes = jnp.asarray(rs.rand(T, 64, 4) * 500, jnp.float32)
    det_boxes = det_boxes.at[..., 2:].set(det_boxes[..., :2] + 30)
    det_valid = jnp.asarray(rs.rand(T, 64) > 0.3)

    def bench(label, step):
        def sort_fn(b0):
            state = init_sort(max_tracks=128)
            _, out = jax.lax.scan(
                lambda s, f: step(s, f[0], f[1]), state,
                (b0, det_valid))
            return out

        @jax.jit
        def run(b):
            def body(i, c):
                out = sort_fn(b + c * 1e-6)
                leaves = jax.tree_util.tree_leaves(out)
                return c + sum(l.astype(jnp.float32).mean()
                               for l in leaves) * 1e-6
            return jax.lax.fori_loop(0, INNER, body, jnp.zeros(()))

        t = timed_once(run, det_boxes)
        print(f"{label:34s}: {t*1e3:7.3f} ms/clip")

    def assign_only(state, bx, vl):
        x_pred, P_pred = kalman.predict(state.x, state.P)
        trk = kalman.state_to_bbox(x_pred)
        iou = _iou_matrix(bx, trk)
        benefit = jnp.where(vl[:, None] & state.alive[None, :], iou,
                            NEG)
        r2c = auction_assign(benefit, eps=1e-3, floor=0.24)
        alive = state.alive | (jnp.sum(r2c) > -100000)
        return state._replace(x=x_pred, P=P_pred, alive=alive), r2c

    def with_update(state, bx, vl):
        state, r2c = assign_only(state, bx, vl)
        K = state.x.shape[0]
        D = bx.shape[0]
        good = r2c >= 0
        col = jnp.maximum(r2c, 0)
        det_for_slot = jnp.full((K,), -1, jnp.int32).at[
            jnp.where(good, col, K)].set(
                jnp.where(good, jnp.arange(D, dtype=jnp.int32), -1),
                mode="drop")
        slot_matched = det_for_slot >= 0
        z = kalman.bbox_to_z(bx[jnp.maximum(det_for_slot, 0)])
        x_new, P_new = kalman.update(state.x, state.P, z,
                                     gate=slot_matched)
        return state._replace(x=x_new, P=P_new), r2c

    def full(state, bx, vl):
        return sort_step(state, bx, vl, assignment="gated_auction")

    bench("predict + gated assign", assign_only)
    bench("  + scatter + kalman update", with_update)
    bench("full sort_step (lifecycle etc.)", full)


if __name__ == "__main__":
    main()
