#!/usr/bin/env python
"""Preproc variants at the production 4:3 geometry (bf16 serving path).

The round-3 breakdown measured the fused s2d preproc at 0.82 ms/clip
at 480x640 -> 384x512 — ~6x its bandwidth/FLOP floor.  Suspected
cause: the einsums keep c=3 as the trailing (lane) axis, so the MXU
runs at ~3/128 lane utilization.  Variant (b) merges (w, c) into one
contiguous lane axis and kron-expands the width weights with I_3, so
both resizes are full-lane matmuls; a final [.., 4, 4, 3] -> [.., 3,
4, 4] transpose restores the canonical (c, by, bx) sub-channel order.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tao_amodal_tpu.ops.pallas.preproc import (
    make_letterbox_weights,
    preprocess_frames_xla_s2d,
)

INNER = 32
T = 16
SRC_H = int(os.environ.get("BD_SRC_H", "480"))
SRC_W = int(os.environ.get("BD_SRC_W", "640"))
H = int(os.environ.get("BD_H", "384"))
W = int(os.environ.get("BD_W", "512"))
DT = jnp.bfloat16


def timed(fn, x):
    @jax.jit
    def run(x0):
        def body(i, c):
            out = fn(c)
            bit = (out.astype(jnp.float32).sum()
                   .astype(jnp.int32) & 1).astype(jnp.uint8)
            return c ^ bit
        return jax.lax.fori_loop(0, INNER, body, x0)

    jax.block_until_ready(run(x))

    @jax.jit
    def tiny(v):
        return v + 1.0

    float(tiny(jnp.zeros((), jnp.float32)))

    def roundtrip():
        s = time.perf_counter()
        float(tiny(jnp.zeros((), jnp.float32)))
        return time.perf_counter() - s

    rt = min(roundtrip() for _ in range(3))

    def block():
        s = time.perf_counter()
        out = run(x)
        float(out.astype(jnp.float32).ravel()[0])
        return time.perf_counter() - s

    return (sorted(block() for _ in range(5))[2] - rt) / INNER


def merged_lane_s2d(frames, wy, wx, mean, std, dt=DT):
    """(b): resize as two full-lane matmuls over a [H, W*3] layout."""
    Tn, Hs, Ws, C = frames.shape
    b = 4
    s_h, s_w = wy.shape[0] // b, wx.shape[0] // b
    f = frames.reshape(Tn, Hs, Ws * C).astype(dt)       # [T, H, W*3]
    wy_t = wy.astype(dt)                                 # [s_h*4, H]
    # Width weights act on the strided (w, c) lanes: kron(wx, I_3).
    wx_k = jnp.einsum("xw,cd->xcwd", wx.astype(jnp.float32),
                      jnp.eye(C, dtype=jnp.float32))
    wx_k = wx_k.reshape(wx.shape[0] * C, Ws * C).astype(dt)
    tmp = jnp.einsum("yh,thn->tyn", wy_t, f,
                     preferred_element_type=jnp.float32).astype(dt)
    out = jnp.einsum("mn,tyn->tym", wx_k, tmp,
                     preferred_element_type=jnp.float32)
    # [T, s_h*4, s_w*4*3] -> canonical [T, s_h, s_w, (c, by, bx)]
    out = out.reshape(Tn, s_h, b, s_w, b, C)
    out = out.transpose(0, 1, 3, 5, 2, 4).reshape(Tn, s_h, s_w,
                                                  C * b * b)
    mean_b = jnp.repeat(jnp.asarray(mean, jnp.float32), b * b)
    std_b = jnp.repeat(jnp.asarray(std, jnp.float32), b * b)
    return ((out - mean_b) / std_b).astype(dt)


def main():
    print("devices:", jax.devices())
    rs = np.random.RandomState(0)
    frames = jnp.asarray(rs.randint(0, 255, (T, SRC_H, SRC_W, 3),
                                    np.uint8))
    wy, wx, _ = make_letterbox_weights((SRC_H, SRC_W), (H, W))
    mean = (123.675, 116.28, 103.53)
    std = (58.395, 57.12, 57.375)

    a = lambda fr: preprocess_frames_xla_s2d(
        fr, wy, wx, mean, std, compute_dtype=DT)
    b = lambda fr: merged_lane_s2d(fr, wy, wx, mean, std)

    ra, rb = np.asarray(a(frames), np.float32), np.asarray(b(frames),
                                                           np.float32)
    err = np.abs(ra - rb).max()
    print(f"max |a-b| = {err:.5f} (bf16 rounding expected ~1e-2)")

    ta = timed(a, frames)
    print(f"(a) current folded einsum : {ta*1e3:7.3f} ms/clip")
    tb = timed(b, frames)
    print(f"(b) merged-lane matmuls   : {tb*1e3:7.3f} ms/clip")


if __name__ == "__main__":
    main()
