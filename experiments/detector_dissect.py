#!/usr/bin/env python
"""Cumulative dissection of the detector's post-FPN path on the real
chip: each measurement adds one stage, so the deltas attribute the
cost of RPN, proposal selection, RoI pooling (packed), box head, and
final NMS exactly as they run inside the full graph (same vmap
structure as ClipDetector.__call__)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tao_amodal_tpu.models.rpn import (
    decode_deltas,
    level_anchors,
    select_proposals,
)
from tao_amodal_tpu.ops.nms import class_aware_nms
from tao_amodal_tpu.ops.roi import multilevel_roi_align
from tao_amodal_tpu.models.detector import RoIBoxHead

import os

INNER = int(os.environ.get("BD_INNER", "16"))
T = 16
DT = jnp.bfloat16
STRIDES = (8, 16, 32, 64, 128)
SCALES = (32, 64, 128, 256, 512)
RATIOS = (0.5, 1.0, 2.0)
NUM_PROPS = int(os.environ.get("BD_PROPS", "128"))
NUM_DETS = 64
# Device-tensor geometry (the 4:3 production shape is 384x512).
HW = (int(os.environ.get("BD_H", "512")), int(os.environ.get("BD_W", "512")))
PRE_NMS_TOPK = int(os.environ.get("BD_TOPK", "150"))


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


def chain(fn, x):
    @jax.jit
    def run(x0):
        def body(i, c):
            out = fn(c)
            leaves = jax.tree_util.tree_leaves(out)
            eps = sum(l.astype(jnp.float32).mean() for l in leaves)
            return c + (eps * 1e-6).astype(c.dtype)
        return jax.lax.fori_loop(0, INNER, body, x0)

    return timed_once(run, x)


def main():
    print("devices:", jax.devices())
    rs = np.random.RandomState(0)
    sizes = [(-(-HW[0] // st), -(-HW[1] // st)) for st in STRIDES]
    pyramid = [jnp.asarray(rs.rand(T, h, w, 256), DT) for h, w in sizes]

    from tao_amodal_tpu.models.rpn import RPNHead

    rpn = RPNHead(num_anchors=3, features=256, dtype=DT)
    rpn_vars = rpn.init(jax.random.PRNGKey(0), [p[:1] for p in pyramid])
    head = RoIBoxHead(80, dtype=DT)
    hv = head.init(jax.random.PRNGKey(1),
                   jnp.zeros((NUM_PROPS, 7, 7, 256), DT))
    anchors = [level_anchors(h, w, st, [sc], RATIOS, dtype=jnp.float32)
               for (h, w), st, sc in zip(sizes, STRIDES, SCALES)]

    def upto(stage):
        def fn(p0):
            pyr = [p0] + pyramid[1:]
            objs, deltas = rpn.apply(rpn_vars, pyr)
            if stage == "rpn":
                return objs + deltas

            def frame_props(args):
                o, d = args
                return select_proposals(o, d, anchors, HW,
                                        pre_nms_topk=PRE_NMS_TOPK,
                                        post_nms_topk=NUM_PROPS)

            props, pscores = jax.vmap(frame_props)((
                [o for o in objs], [d for d in deltas]))
            if stage == "props":
                return props, pscores

            def frame_pool(pyr_frame, pr):
                return multilevel_roi_align(
                    pyr_frame, pr, out_size=7, canonical_level=1,
                    strides=STRIDES[:4], method="prroi_packed")

            pooled = jax.vmap(frame_pool)([p[:, ] for p in pyr[:4]],
                                          props)
            if stage == "pool":
                return pooled

            def frame_head(pl):
                return head.apply(hv, pl)

            logits, bdeltas, feats = jax.vmap(frame_head)(pooled)
            if stage == "head":
                return logits, bdeltas

            def frame_final(pr, ps, lg, bd):
                probs = jax.nn.softmax(lg, axis=-1)[:, 1:]
                boxes = decode_deltas(pr, bd)
                scores = probs * (ps > 0)[:, None]
                cls_ids = jnp.argmax(scores, axis=-1)
                best = jnp.max(scores, axis=-1)
                keep = class_aware_nms(boxes, best, cls_ids, 0.5,
                                       NUM_DETS)
                valid = keep >= 0
                ks = jnp.maximum(keep, 0)
                return boxes[ks] * valid[:, None], jnp.where(
                    valid, best[ks], 0.0)

            return jax.vmap(frame_final)(props, pscores, logits,
                                         bdeltas)

        return fn

    prev = 0.0
    for stage in ("rpn", "props", "pool", "head", "full"):
        t = chain(upto(stage), pyramid[0]) * 1e3
        print(f"cum {stage:5s}: {t:7.3f} ms/clip  (delta "
              f"{t - prev:+7.3f})")
        prev = t


if __name__ == "__main__":
    main()
