#!/usr/bin/env python
"""Fused PrRoI kernel variants vs the XLA two-einsum path.

The XLA path's floor is the [R, out, H, C] HBM intermediate
(~16.5 MB/frame bf16 at the 4:3 canvas -> ~0.64 ms/clip of pure
traffic).  A fused kernel keeps the canvas + intermediate in VMEM.
The open question is which second-contraction formulation Mosaic
lowers efficiently (batched dot_general / 3-D dot_general / per-roi
loops all have different layout costs).  This measures each candidate
on the real chip at the shipped 4:3 pipeline shape:

  canvas 48x98(->112) x256 bf16, R=96 rois, out=7, T=16 frames.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tao_amodal_tpu.ops.roi import prroi_pool

T = 16
H, W = 48, 98
WPAD = 112  # 16-multiple
C = 256
R = 96
OUT = 7
INNER = int(os.environ.get("INNER", "64"))
# Comma-list of variants to run (default: all).
ONLY = set(filter(None, os.environ.get("ONLY", "").split(",")))
DT = jnp.bfloat16


def want(tag):
    return not ONLY or tag in ONLY


def _hat_antideriv(u):
    u = jnp.clip(u, -1.0, 1.0)
    return jnp.where(u <= 0, 0.5 * (u + 1.0) ** 2,
                     0.5 + u - 0.5 * u ** 2)


def _axis_weights_2d(lo0, step, n):
    """[R, out, n] hat-integral weights from per-roi scalars, using
    only 2-D iota (Mosaic constraint)."""
    bins = jax.lax.broadcasted_iota(
        jnp.int32, (OUT, 1), 0).astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(
        jnp.int32, (1, n), 1).astype(jnp.float32)
    lo = lo0[:, None, None] + bins[None] * step[:, None, None]
    hi = lo + step[:, None, None]
    return _hat_antideriv(hi - idx[None]) - _hat_antideriv(lo - idx[None])


# ---------------------------------------------------------------- V1:
# stage 1 = per-x-bin flat matmul [R, W] @ [W, H*C]; stage 2 = batched
# dot_general over the roi axis (does Mosaic lower it at all / well?).
def _v1_kernel(rois_ref, feat_ref, out_ref):
    # feat_ref: [WPAD, H*C] (w-major canvas, pre-flattened in XLA)
    rois = rois_ref[:]
    x0, y0 = rois[:, 0], rois[:, 1]
    bw = jnp.maximum((rois[:, 2] - x0) / OUT, 1e-8)
    bh = jnp.maximum((rois[:, 3] - y0) / OUT, 1e-8)
    wx = _axis_weights_2d(x0, bw, WPAD)            # [R, OUT, WPAD] f32
    wy = _axis_weights_2d(y0, bh, H)               # [R, OUT, H]
    inv_area = 1.0 / (bw * bh)

    feat = feat_ref[:]                             # [WPAD, H*C]
    for x in range(OUT):
        m1 = jnp.dot(wx[:, x, :].astype(DT), feat,
                     preferred_element_type=jnp.float32)   # [R, H*C]
        m1 = m1.reshape(R, H, C)
        o = jax.lax.dot_general(
            wy, m1, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # [R, OUT, C]
        out_ref[:, :, x, :] = (
            o * inv_area[:, None, None]).astype(out_ref.dtype)


# ---------------------------------------------------------------- V2:
# stage 1 = 3-D dot_general [R, W] @ [W, H, C] -> [R, H, C] (let Mosaic
# pick the output layout), stage 2 = batched dot_general.
def _v2_kernel(rois_ref, feat_ref, out_ref):
    # feat_ref: [WPAD, H, C]
    rois = rois_ref[:]
    x0, y0 = rois[:, 0], rois[:, 1]
    bw = jnp.maximum((rois[:, 2] - x0) / OUT, 1e-8)
    bh = jnp.maximum((rois[:, 3] - y0) / OUT, 1e-8)
    wx = _axis_weights_2d(x0, bw, WPAD)
    wy = _axis_weights_2d(y0, bh, H)
    inv_area = 1.0 / (bw * bh)

    feat = feat_ref[:]                             # [WPAD, H, C]
    for x in range(OUT):
        m1 = jax.lax.dot_general(
            wx[:, x, :].astype(DT), feat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [R, H, C]
        o = jax.lax.dot_general(
            wy, m1, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # [R, OUT, C]
        out_ref[:, :, x, :] = (
            o * inv_area[:, None, None]).astype(out_ref.dtype)


# ---------------------------------------------------------------- V5:
# h-major flat canvas [H, W*C] (the NATURAL packed-canvas layout -> no
# XLA transpose feeding the kernel); stage 1 = per-y-bin flat matmul
# [R, H] @ [H, W*C]; stage 2 = batched dot_general contracting W.
def _v5_kernel(rois_ref, feat_ref, out_ref, *, wpad):
    # feat_ref: [H, wpad*C]
    rois = rois_ref[:]
    x0, y0 = rois[:, 0], rois[:, 1]
    bw = jnp.maximum((rois[:, 2] - x0) / OUT, 1e-8)
    bh = jnp.maximum((rois[:, 3] - y0) / OUT, 1e-8)
    wx = _axis_weights_2d(x0, bw, wpad)            # [R, OUT, wpad] f32
    wy = _axis_weights_2d(y0, bh, H)               # [R, OUT, H]
    inv_area = 1.0 / (bw * bh)

    feat = feat_ref[:]                             # [H, wpad*C]
    for y in range(OUT):
        m1 = jnp.dot(wy[:, y, :].astype(DT), feat,
                     preferred_element_type=jnp.float32)   # [R, wpad*C]
        m1 = m1.reshape(R, wpad, C)
        o = jax.lax.dot_general(
            wx, m1, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # [R, OUT(x), C]
        out_ref[:, y, :, :] = (
            o * inv_area[:, None, None]).astype(out_ref.dtype)


# ---------------------------------------------------------------- V3:
# both stages batched dot_general with h contracted first:
# stage 1: [R, OUT(y), H] @ [H, W*C] flat (M = R*OUT rows);
# stage 2: per-x gather-free: like the old kernel but block-diag
# grouped second stage (G rois share one [G*OUT, G*H] block-diag LHS).
def _v3_kernel(rois_ref, feat_ref, out_ref, *, group=16):
    # feat_ref: [H, W*C] (h-major canvas)
    rois = rois_ref[:]
    x0, y0 = rois[:, 0], rois[:, 1]
    bw = jnp.maximum((rois[:, 2] - x0) / OUT, 1e-8)
    bh = jnp.maximum((rois[:, 3] - y0) / OUT, 1e-8)
    wx = _axis_weights_2d(x0, bw, WPAD)            # [R, OUT, WPAD]
    inv_area = 1.0 / (bw * bh)

    # Flat [R*OUT, H] y-weights via arithmetic on 2-D iota.
    BO = R * OUT
    rows = jax.lax.broadcasted_iota(jnp.int32, (BO, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    onehot = (rows // OUT == cols).astype(jnp.float32)
    y0f = jnp.dot(onehot, y0[:, None])
    bhf = jnp.dot(onehot, bh[:, None])
    binf = (rows % OUT).astype(jnp.float32)
    idx_h = jax.lax.broadcasted_iota(
        jnp.int32, (1, H), 1).astype(jnp.float32)
    lo = y0f + binf * bhf
    hi = lo + bhf
    wy_flat = (_hat_antideriv(hi - idx_h)
               - _hat_antideriv(lo - idx_h)).astype(DT)   # [BO, H]

    feat = feat_ref[:]                             # [H, W*C]
    m1 = jnp.dot(wy_flat, feat,
                 preferred_element_type=jnp.float32).astype(DT)
    # m1: [R*OUT(y), W*C].  Second stage contracts w per roi-group with
    # a block-diagonal wx LHS: for group g of G rois,
    #   lhs [G*OUT(x), G*WPAD] (block-diag), rhs = m1 rows of the group
    #   reshaped [G*?]... w sits interleaved in lanes -> instead
    # contract from the right is impossible; fall back to per-roi dot
    # on the [OUT, W, C] view (known-slow transpose) -- SKIPPED; v3
    # only measures stage 1 cost to attribute layouts.
    out_ref[:, :, 0, :] = (
        m1[:, :C].reshape(R, OUT, C)
        * inv_area[:, None, None]).astype(out_ref.dtype)
    for x in range(1, OUT):
        out_ref[:, :, x, :] = out_ref[:, :, 0, :]


# ---------------------------------------------------------------- V4:
# stage 1 = per-x-bin 3-D dot_general (as V2); stage 2 = block-diag
# grouped FLAT matmuls: G rois share one [G*OUT, G*H] block-diagonal
# wy LHS against the group's m1 rows [(r,h), c] -> [G*OUT, C].  All
# MXU, no transposes, no per-roi batching.
def _v4_kernel(rois_ref, feat_ref, out_ref, *, group=16):
    # out_ref: [OUT(x), R*OUT(r,y), C] — rows (r, y); the caller
    # reorders to [R, OUT, OUT, C] in XLA (free fused transpose).
    rois = rois_ref[:]
    x0, y0 = rois[:, 0], rois[:, 1]
    bw = jnp.maximum((rois[:, 2] - x0) / OUT, 1e-8)
    bh = jnp.maximum((rois[:, 3] - y0) / OUT, 1e-8)
    wx = _axis_weights_2d(x0, bw, WPAD)            # [R, OUT, WPAD] f32

    G = group
    n_groups = R // G
    GO, GH = G * OUT, G * H
    # Per-group block-diagonal wy LHS, built once (shared by all x):
    # rows (i, y), cols (j, h); nonzero iff i == j.
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (GO, GH), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (GO, GH), 1)
    diag_mask = (rows_i // OUT == cols_i // H)
    idx_h = (cols_i % H).astype(jnp.float32)
    bin_f = (rows_i % OUT).astype(jnp.float32)
    sel = jax.lax.broadcasted_iota(jnp.int32, (GO, 1), 0) // OUT
    onehot = (sel == jax.lax.broadcasted_iota(
        jnp.int32, (1, G), 1)).astype(jnp.float32)     # [GO, G]
    lhs, inv_rows = [], []
    for g in range(n_groups):
        # 2-D slices only: 1-D vector slices lower as (unsupported)
        # gathers on Mosaic.
        rois_g = rois[g * G:(g + 1) * G, :]            # [G, 4]
        y0s = rois_g[:, 1:2]                           # [G, 1]
        bhs = jnp.maximum((rois_g[:, 3:4] - y0s) / OUT, 1e-8)
        bws = jnp.maximum((rois_g[:, 2:3] - rois_g[:, 0:1]) / OUT,
                          1e-8)
        y0g = jnp.dot(onehot, y0s)                     # [GO, 1]
        bhg = jnp.dot(onehot, bhs)
        lo = y0g + bin_f * bhg
        hi = lo + bhg
        wyg = _hat_antideriv(hi - idx_h) - _hat_antideriv(lo - idx_h)
        lhs.append(jnp.where(diag_mask, wyg, 0.0).astype(DT))
        inv_rows.append(jnp.dot(onehot, 1.0 / (bws * bhs)))  # [GO, 1]

    feat = feat_ref[:]                             # [WPAD, H, C]
    for x in range(OUT):
        m1 = jax.lax.dot_general(
            wx[:, x, :].astype(DT), feat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(DT)  # [R, H, C]
        m1_flat = m1.reshape(R * H, C)             # rows (r, h): free
        for g in range(n_groups):
            o = jnp.dot(lhs[g], m1_flat[g * GH:(g + 1) * GH],
                        preferred_element_type=jnp.float32)  # [GO, C]
            out_ref[x, g * GO:(g + 1) * GO, :] = (
                o * inv_rows[g]).astype(out_ref.dtype)


def make_call(kernel, feat_shape, interpret=False):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, OUT, OUT, C), DT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return f


def timed(fn, *args):
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
    canvas = jnp.asarray(rs.rand(T, H, W, C), DT)      # h-major
    canvas_p = jnp.pad(canvas, ((0, 0), (0, 0), (0, WPAD - W), (0, 0)))
    # Rois in canvas coords, mixed sizes within [0, W) x [0, H).
    rois = np.zeros((T, R, 4), np.float32)
    rois[..., 0] = rs.rand(T, R) * (W - 10)
    rois[..., 1] = rs.rand(T, R) * (H - 10)
    rois[..., 2] = rois[..., 0] + 2 + rs.rand(T, R) * 30
    rois[..., 3] = rois[..., 1] + 2 + rs.rand(T, R) * 20
    rois = jnp.asarray(rois)

    # Reference: XLA path per frame.
    @jax.jit
    def xla_ref(canvas, rois):
        return jax.vmap(lambda f, r: prroi_pool(f, r, OUT, 1.0))(
            canvas, rois)

    ref = np.asarray(xla_ref(canvas, rois), np.float32)

    def chain(fn_frame, feat):
        @jax.jit
        def run(feat, rois):
            def body(i, carry):
                acc, r = carry
                out = jax.vmap(fn_frame)(feat, r)
                eps = out.astype(jnp.float32).mean() * 1e-6
                return acc + eps, r + eps
            acc, _ = jax.lax.fori_loop(
                0, INNER, body, (jnp.zeros((), jnp.float32), rois))
            return acc
        return timed(run, feat, rois)

    if want("xla"):
        t = chain(lambda f, r: prroi_pool(f, r, OUT, 1.0), canvas)
        print(f"XLA two-einsum        : {t*1e3:7.3f} ms/clip")

    # V1: w-major flat canvas [WPAD, H*C]
    wmaj = canvas_p.transpose(0, 2, 1, 3).reshape(T, WPAD, H * C)
    v1 = make_call(_v1_kernel, (WPAD, H * C))
    try:
        if not want("v1"):
            raise RuntimeError("skipped")
        out = jax.vmap(v1)(rois, wmaj)
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        t = chain(lambda f, r: v1(r, f), wmaj)
        print(f"V1 flat+batched-dg    : {t*1e3:7.3f} ms/clip"
              f"  (max err {err:.2e})")
    except Exception as e:
        print("V1 FAILED:", type(e).__name__, str(e)[:300])

    # V2: 3-D canvas [WPAD, H, C]
    wmaj3 = canvas_p.transpose(0, 2, 1, 3)
    v2 = make_call(_v2_kernel, (WPAD, H, C))
    try:
        if not want("v2"):
            raise RuntimeError("skipped")
        out = jax.vmap(v2)(rois, wmaj3)
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        t = chain(lambda f, r: v2(r, f), wmaj3)
        print(f"V2 3d-dg+batched-dg   : {t*1e3:7.3f} ms/clip"
              f"  (max err {err:.2e})")
    except Exception as e:
        print("V2 FAILED:", type(e).__name__, str(e)[:300])

    # V1t: V1 with the canvas transpose INSIDE the timed graph — the
    # honest integration cost when the pipeline's canvas is h-major.
    try:
        if not want("v1t"):
            raise RuntimeError("skipped")
        def v1t(f, r):
            wm = f.transpose(1, 0, 2)
            wm = jnp.pad(wm, ((0, WPAD - W), (0, 0), (0, 0)))
            return v1(r, wm.reshape(WPAD, H * C))

        out = jax.vmap(v1t)(canvas, rois)
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        t = chain(v1t, canvas)
        print(f"V1 + in-graph transp  : {t*1e3:7.3f} ms/clip"
              f"  (max err {err:.2e})")
    except Exception as e:
        print("V1t FAILED:", type(e).__name__, str(e)[:300])

    # V5: natural h-major flat canvas (no transpose), y-first.
    hflat = canvas_p.reshape(T, H, WPAD * C)
    v5 = make_call(functools.partial(_v5_kernel, wpad=WPAD),
                   (H, WPAD * C))
    try:
        if not want("v5"):
            raise RuntimeError("skipped")
        out = jax.vmap(v5)(rois, hflat)
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        t = chain(lambda f, r: v5(r, f), hflat)
        print(f"V5 hmaj flat+batch-dg : {t*1e3:7.3f} ms/clip"
              f"  (max err {err:.2e})")
    except Exception as e:
        print("V5 FAILED:", type(e).__name__, str(e)[:300])

    # V5n: same but on the UNPADDED 98-wide canvas (is the 16-multiple
    # rounding needed at all when the flat view is [H, W*C]?).
    hflat_n = canvas.reshape(T, H, W * C)
    v5n = make_call(functools.partial(_v5_kernel, wpad=W), (H, W * C))
    try:
        if not want("v5n"):
            raise RuntimeError("skipped")
        out = jax.vmap(v5n)(rois, hflat_n)
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        t = chain(lambda f, r: v5n(r, f), hflat_n)
        print(f"V5n hmaj unpadded     : {t*1e3:7.3f} ms/clip"
              f"  (max err {err:.2e})")
    except Exception as e:
        print("V5n FAILED:", type(e).__name__, str(e)[:300])

    # V4: block-diag grouped stage 2, several group sizes
    for G in ((8, 16, 32) if want("v4") else ()):
        v4_raw = pl.pallas_call(
            functools.partial(_v4_kernel, group=G),
            out_shape=jax.ShapeDtypeStruct((OUT, R * OUT, C), DT),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

        def v4(r, f):
            o = v4_raw(r, f)                       # [OUT, R*OUT, C]
            return o.reshape(OUT, R, OUT, C).transpose(1, 2, 0, 3)

        try:
            out = jax.vmap(v4)(rois, wmaj3)
            err = np.abs(np.asarray(out, np.float32) - ref).max()
            t = chain(lambda f, r: v4(r, f), wmaj3)
            print(f"V4 blockdiag G={G:<3d}    : {t*1e3:7.3f} ms/clip"
                  f"  (max err {err:.2e})")
        except Exception as e:
            print(f"V4 G={G} FAILED:", type(e).__name__, str(e)[:300])

    # V3: stage-1-only layout probe (h-major flat canvas)
    hmaj = canvas_p.reshape(T, H, WPAD * C)
    v3 = make_call(functools.partial(_v3_kernel), (H, WPAD * C))
    try:
        if not want("v3"):
            raise RuntimeError("skipped")
        jax.block_until_ready(jax.vmap(v3)(rois, hmaj))
        t = chain(lambda f, r: v3(r, f), hmaj)
        print(f"V3 stage1-only (flat) : {t*1e3:7.3f} ms/clip"
              f"  (lower bound, no stage 2)")
    except Exception as e:
        print("V3 FAILED:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
