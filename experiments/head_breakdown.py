#!/usr/bin/env python
"""Detection-head + SORT breakdown on the real chip.

Times each post-backbone stage in isolation with chained carries:
RPN tower, proposal selection (topk+NMS), RoI pooling, box head,
final class-aware NMS, the Amodal Expander, and the SORT scan
(auction association).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os

INNER = 16
T = 16
DT = jnp.bfloat16
# Processing geometry (BD_H x BD_W device tensor; default square 512).
BD_H = int(os.environ.get("BD_H", "512"))
BD_W = int(os.environ.get("BD_W", "512"))
NUM_PROPS = int(os.environ.get("BD_PROPS", "128"))


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

    from tao_amodal_tpu.models.rpn import (
        RPNHead,
        level_anchors,
        select_proposals,
    )

    # Pyramid shapes for BD_H x BD_W, P3-P7.
    strides = [8, 16, 32, 64, 128]
    scales = [32, 64, 128, 256, 512]
    sizes = [(-(-BD_H // s), -(-BD_W // s)) for s in strides]
    pyramid = [jnp.asarray(rs.rand(T, h, w, 256), DT)
               for h, w in sizes]

    rpn = RPNHead(num_anchors=3, features=256, dtype=DT)
    rpn_vars = rpn.init(jax.random.PRNGKey(0),
                        [p[:1] for p in pyramid])

    t = chain(lambda p0: rpn.apply(rpn_vars, [p0] + pyramid[1:]),
              pyramid[0])
    print(f"RPN tower (5 levels)       : {t*1e3:7.3f} ms/clip")

    objs, deltas = rpn.apply(rpn_vars, pyramid)
    anchors = [level_anchors(h, w, st, [sc], (0.5, 1.0, 2.0),
                             dtype=jnp.float32)
               for (h, w), st, sc in zip(sizes, strides, scales)]

    def props_of(o0):
        def per_frame(args):
            o, ds = args
            return select_proposals(o, ds, anchors, (BD_H, BD_W),
                                    post_nms_topk=NUM_PROPS)
        return jax.vmap(per_frame)((
            [o0] + [o for o in objs[1:]], [d for d in deltas]))

    objs_l = [o for o in objs]
    t = chain(lambda o0: props_of(o0), objs_l[0])
    print(f"proposals (topk+NMS, vmap) : {t*1e3:7.3f} ms/clip")

    from tao_amodal_tpu.ops.roi import multilevel_roi_align

    props = jnp.asarray(rs.rand(T, NUM_PROPS, 4) * 400, jnp.float32)
    props = props.at[..., 2:].set(props[..., :2] + 30 +
                                  props[..., 2:] * 0.2)

    def pool_fn(p0):
        def per_frame(pyr_frame, pr):
            return multilevel_roi_align(pyr_frame, pr, out_size=7,
                                        canonical_level=1,
                                        strides=strides[:4])
        return jax.vmap(per_frame)(
            [p for p in pyramid[:4]], p0)

    t = chain(pool_fn, props)
    print(f"RoI pooling ({NUM_PROPS} rois)     : {t*1e3:7.3f} ms/clip")

    from tao_amodal_tpu.models.detector import RoIBoxHead

    head = RoIBoxHead(80, dtype=DT)
    pooled = jnp.asarray(rs.rand(T, NUM_PROPS, 7, 7, 256), DT)
    hv = head.init(jax.random.PRNGKey(1), pooled[0])
    t = chain(lambda p0: jax.vmap(
        lambda pp: head.apply(hv, pp))(p0), pooled)
    print(f"box head ({NUM_PROPS} rois)        : {t*1e3:7.3f} ms/clip")

    from tao_amodal_tpu.ops.nms import class_aware_nms

    boxes = jnp.asarray(rs.rand(T, NUM_PROPS, 4) * 500, jnp.float32)
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 20)
    scores = jnp.asarray(rs.rand(T, NUM_PROPS), jnp.float32)
    classes = jnp.asarray(rs.randint(0, 80, (T, NUM_PROPS)), jnp.int32)

    def nms_fn(b0):
        return jax.vmap(lambda b, s, c: class_aware_nms(
            b, s, c, 0.5, 64))(b0, scores, classes)

    t = chain(nms_fn, boxes)
    print(f"class-aware NMS (vmap)     : {t*1e3:7.3f} ms/clip")

    from tao_amodal_tpu.models.amodal_expander import AmodalExpander

    exp = AmodalExpander(dtype=DT)
    feats = jnp.asarray(rs.rand(T, 64, 1024), DT)
    dboxes = jnp.asarray(rs.rand(T, 64, 4) * 500, jnp.float32)
    ev = exp.init(jax.random.PRNGKey(2), feats[0], dboxes[0],
                  image_hw=(BD_H, BD_W))

    def exp_fn(f0):
        return jax.vmap(lambda f, b: exp.apply(
            ev, f, b, image_hw=(BD_H, BD_W)))(f0, dboxes)

    t = chain(exp_fn, feats)
    print(f"amodal expander            : {t*1e3:7.3f} ms/clip")

    from tao_amodal_tpu.trackers.sort import init_sort, sort_step

    det_boxes = jnp.asarray(rs.rand(T, 64, 4) * 500, jnp.float32)
    det_boxes = det_boxes.at[..., 2:].set(det_boxes[..., :2] + 30)
    det_valid = jnp.asarray(rs.rand(T, 64) > 0.3)

    def sort_fn(b0):
        state = init_sort(max_tracks=128)

        def assoc(state, frame):
            bx, vl = frame
            state, out = sort_step(state, bx, vl)
            return state, (out["det_track_id"], out["det_report"])

        _, (tids, rep) = jax.lax.scan(assoc, state, (b0, det_valid))
        return tids

    t = chain(sort_fn, det_boxes)
    print(f"SORT scan (16 frames)      : {t*1e3:7.3f} ms/clip")


if __name__ == "__main__":
    main()
