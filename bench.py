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
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--clip_len", type=int, default=8,
                   help="frames per clip program. 8 is the measured "
                        "single-chip optimum at the production "
                        "geometries (+10%% over 16: the stage-1/2 "
                        "activation working set halves; T=4 pays "
                        "per-dispatch costs, T=12 breaks the "
                        "8-multiple batch tiling — BENCH_NOTES "
                        "round-5). Serving output is clip-length-"
                        "invariant: SORT state threads across clip "
                        "boundaries (tests/test_batched_pipeline.py)")
    p.add_argument("--videos", type=int, default=1,
                   help="videos processed concurrently per chip (the "
                        "v5e-8 serving shape batches several "
                        "independent video streams per chip; B*T "
                        "frames batch through the detector, SORT "
                        "runs vmapped per video)")
    p.add_argument("--assignment", default="greedy",
                   choices=["gated_auction", "greedy", "auction"],
                   help="SORT association algorithm (accuracy-"
                        "equivalent per the study; latency differs)")
    p.add_argument("--pre_nms_topk", type=int, default=100,
                   help="per-level pre-NMS candidate budget")
    p.add_argument("--sort_on", default="visible",
                   choices=["amodal", "visible"],
                   help="boxes feeding SORT association (same FLOPs "
                        "either way; 'visible' is the flagship default "
                        "— the reference decomposition, shipped by the "
                        "round-5 study)")
    p.add_argument("--num_proposals", type=int, default=96,
                   help="RoI budget per frame (accuracy impact "
                        "quantified in experiments/accuracy_study.json: "
                        "no det-AP penalty vs 128 at 3 checkpoints)")
    p.add_argument("--fused_stages", default="",
                   help="comma list of trunk stages (1-4) to run "
                        "through the fused bottleneck-chain Pallas "
                        "kernel (e.g. '1,2'); empty = XLA convs")
    p.add_argument("--pooling", default="auto",
                   choices=["auto", "packed", "fused"],
                   help="RoI pooling impl: XLA two-einsum ('packed') "
                        "or the fused Pallas kernel ('fused'); 'auto' "
                        "= fused on TPU")
    geo = p.add_mutually_exclusive_group()
    geo.add_argument("--square", action="store_true",
                     help="square 512x512 source/processing geometry "
                          "(the round-1 benchmark series) instead of "
                          "the production 640x480 -> 512x384 letterbox")
    geo.add_argument("--wide", action="store_true",
                     help="16:9 sources (1280x720 -> 512x288): the "
                          "BDD/ArgoVerse deployment geometry")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    # Persistent compile cache: repeated bench runs skip the (slow,
    # tunnel-bound) TPU compile when the graph is unchanged.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tao_amodal_tpu.pipeline import AmodalPipeline

    on_tpu = any(d.platform == "tpu" for d in jax.devices())

    # Production-shape config: ResNet-50 trunk, bf16 compute on TPU,
    # space-to-depth stem fed by the fused preprocessing einsum
    # (preproc is INSIDE the measured path: uint8 frames in).
    #
    # Geometry: TAO-Amodal sources are standard video (640x480 / WxH
    # 4:3 and 16:9 — none are square); the serving policy is max-side
    # 512, so the device tensor for a 4:3 source is 512x384.  The
    # round-1 series letterboxed into a 512x512 square, spending 25% of
    # every backbone/FPN/RPN op on constant padding rows; `--square`
    # reproduces that geometry for series continuity (both numbers are
    # logged in BENCH_NOTES.md).
    T = args.clip_len
    B = args.videos
    if args.square:
        SRC_H, SRC_W, OUT = 512, 512, (512, 512)
    elif args.wide:
        SRC_H, SRC_W, OUT = 720, 1280, (288, 512)
    else:
        SRC_H, SRC_W, OUT = 480, 640, (384, 512)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    pipeline = AmodalPipeline.create(
        num_classes=80, num_dets=64,
        num_proposals=args.num_proposals,
        backbone_stages=(3, 4, 6, 3), dtype=dtype,
        pallas_pooling=False, stem="s2d_pre",
        sort_assignment=args.assignment, sort_on=args.sort_on,
        pre_nms_topk=args.pre_nms_topk,
        pooling=args.pooling,
        fused_stages=tuple(int(s) for s in args.fused_stages.split(",")
                           if s.strip()))

    rng = jax.random.PRNGKey(0)
    # Several distinct RAW uint8 clips, cycled, so no caching shortcut
    # can skip real execution.
    clips = [jnp.asarray(np.random.RandomState(i).randint(
        0, 255, (B, T, SRC_H, SRC_W, 3) if B > 1
        else (T, SRC_H, SRC_W, 3), np.uint8)) for i in range(3)]
    init_frames = clips[0][0, :2] if B > 1 else clips[0][:2]
    init_in, _ = pipeline.preprocess(init_frames, out_size=OUT,
                                     use_pallas=on_tpu)
    # One jitted program (persistent-cacheable) instead of hundreds of
    # eager initializer ops, each paying a tunnel round-trip: cuts the
    # bench's wall-clock setup from minutes to seconds on warm cache.
    variables = jax.jit(pipeline.init)(rng, init_in)

    def run_one(frames):
        if B > 1:  # [B, T, H, W, 3]: preproc per-frame over B*T
            flat = frames.reshape((B * T,) + frames.shape[2:])
            clip, _ = pipeline.preprocess(flat, out_size=OUT,
                                          use_pallas=on_tpu)
            clip = clip.reshape((B, T) + clip.shape[1:])
            out, _ = pipeline.batched(variables, clip.astype(dtype))
        else:
            clip, _ = pipeline.preprocess(frames, out_size=OUT,
                                          use_pallas=on_tpu)
            out = pipeline(variables, clip.astype(dtype))
        # Scalar checksum chains the data dependency across iterations
        # so one host fetch at the end forces every program to have
        # truly executed (the remote TPU tunnel is deeply async:
        # block_until_ready alone under-measures, and repeated
        # identical inputs can be served from a replay cache).
        # Sum EVERY output head (incl. track_ids/valid) — otherwise
        # XLA dead-code-eliminates the SORT association entirely and
        # the number silently excludes tracking.
        return (out["scores"].sum()
                + out["boxes"].sum().astype(jnp.float32)
                + out["track_ids"].sum().astype(jnp.float32)
                + out["valid"].sum().astype(jnp.float32)
                + out["classes"].sum().astype(jnp.float32))

    # Block size: with the ~29 ms remote-tunnel RTT subtracted out,
    # RTT *jitter* still pollutes the residual — at 12 iters a 4:3
    # T=16 block is only ~100 ms of chip work, so +-3 ms of tunnel
    # noise is +-3% of the reading (observed 1863 vs 2010 across
    # sessions).  Keep ~576 frames (~300 ms of real work at 4:3)
    # behind each sync point regardless of clip length.
    iters = max(36, (36 * 16) // max(T, 1))

    # The iteration loop lives IN-GRAPH (lax.fori_loop): each step
    # picks the next of the 3 resident clips, XORs in a bit derived
    # from the previous checksum (a true data dependence — no DCE, no
    # replay cache, no cross-iteration overlap), and accumulates the
    # checksum.  This measures CHIP throughput; dispatch-chained
    # separate programs additionally pay ~0.6 ms/program of remote
    # tunnel dispatch overhead that a locally-attached deployment
    # does not (both numbers logged in BENCH_NOTES.md).
    @jax.jit
    def run_block(stacked):  # [3, T, H, W, 3] uint8
        def body(i, carry):
            acc, bit = carry
            frames = jax.lax.dynamic_index_in_dim(
                stacked, i % 3, axis=0, keepdims=False)
            s = run_one(frames ^ bit)
            acc = acc + s
            bit = (s.astype(jnp.int32) & 1).astype(jnp.uint8)
            return acc, bit
        acc, _ = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros((), jnp.float32),
                             jnp.zeros((), jnp.uint8)))
        return acc

    stacked = jnp.stack(clips)
    # Compile + warm up (forced by host fetch).
    float(run_block(stacked))
    # Analytic FLOP count of the measured program: the numerator of
    # the MFU figure reported below (auditable against roofline
    # claims — VERDICT r4 item 7).  Counted by jaxpr traversal
    # (utils/flops.py) because XLA's cost_analysis under-reports TPU
    # convs; the Pallas pooling kernel is opaque to the jaxpr, so the
    # count traces an identical pipeline on its XLA 'packed' pooling
    # path (algorithmically the same math, per the parity tests).
    try:
        from tao_amodal_tpu.utils.flops import count_flops

        flop_pipeline = pipeline._replace(
            detector=pipeline.detector.clone(pooling="packed"))

        def flop_run(frames):
            if B > 1:
                flat = frames.reshape((B * T,) + frames.shape[2:])
                clip, _ = flop_pipeline.preprocess(
                    flat, out_size=OUT, use_pallas=False)
                clip = clip.reshape((B, T) + clip.shape[1:])
                out, _ = flop_pipeline.batched(variables,
                                               clip.astype(dtype))
            else:
                clip, _ = flop_pipeline.preprocess(
                    frames, out_size=OUT, use_pallas=False)
                out = flop_pipeline(variables, clip.astype(dtype))
            return out["scores"].sum()

        clip_flops = count_flops(
            flop_run, jax.ShapeDtypeStruct(clips[0].shape, jnp.uint8))
        block_flops = float(clip_flops) * iters
    except Exception:
        block_flops = None

    @jax.jit
    def tiny(x):
        return x + 1.0

    def roundtrip_baseline():
        start = time.perf_counter()
        float(tiny(jnp.zeros((), jnp.float32)))
        return time.perf_counter() - start

    def timed_block():
        start = time.perf_counter()
        float(run_block(stacked))  # single sync point
        return time.perf_counter() - start

    float(tiny(jnp.zeros((), jnp.float32)))  # compile
    roundtrip = min(roundtrip_baseline() for _ in range(5))
    elapsed = sorted(timed_block() for _ in range(5))[2] - roundtrip
    frames_per_sec = iters * T * B / max(elapsed, 1e-6)
    baseline = 2000.0  # BASELINE.json north-star target
    record = {
        "metric": "frames/sec/chip (preproc+detect+expand+track, "
                  f"{SRC_H}x{SRC_W} src -> {OUT[0]}x{OUT[1]} r50-fpn"
                  + (f", {B} video streams" if B > 1 else "")
                  + f", {'tpu' if on_tpu else 'cpu'})",
        "value": round(frames_per_sec, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / baseline, 4),
    }
    if block_flops is not None and on_tpu:
        # v5e peak: 197 TFLOP/s bf16 (394 int8).  XLA counts each
        # MAC as 2 flops, so flops/elapsed/peak is the standard MFU.
        peak = 197e12
        record["mfu"] = round(block_flops / max(elapsed, 1e-6) / peak,
                              4)
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
