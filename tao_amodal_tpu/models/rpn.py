"""Region Proposal Network head + anchor/proposal machinery.

Detector-side RPN (distinct from the Siamese RPN heads): shared conv
tower over each pyramid level predicting objectness + box deltas per
anchor; proposal selection is fully batched/static-shape — top-k per
level, delta decode, clip, then device-side NMS over a fixed proposal
budget (no dynamic shapes anywhere, XLA-friendly).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tao_amodal_tpu.ops.nms import batched_nms


def level_anchors(h, w, stride, scales, ratios, dtype=jnp.float32):
    """Anchor grid for one level -> ``[h*w*A, 4]`` xyxy."""
    scales = jnp.asarray(scales, dtype)
    ratios = jnp.asarray(ratios, dtype)
    ws = (scales[None, :] * jnp.sqrt(1.0 / ratios)[:, None]).reshape(-1)
    hs = (scales[None, :] * jnp.sqrt(ratios)[:, None]).reshape(-1)
    cx = (jnp.arange(w, dtype=dtype) + 0.5) * stride
    cy = (jnp.arange(h, dtype=dtype) + 0.5) * stride
    cxg, cyg = jnp.meshgrid(cx, cy)  # [h, w]
    boxes = jnp.stack([
        cxg[:, :, None] - ws / 2, cyg[:, :, None] - hs / 2,
        cxg[:, :, None] + ws / 2, cyg[:, :, None] + hs / 2,
    ], axis=-1)  # [h, w, A, 4]
    return boxes.reshape(-1, 4)


def decode_deltas(anchors, deltas, clip=4.135):
    """(dx,dy,dw,dh) deltas -> xyxy boxes (Faster-RCNN convention)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
    ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
    dx, dy, dw, dh = (deltas[:, i] for i in range(4))
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(jnp.minimum(dw, clip))
    h = ah * jnp.exp(jnp.minimum(dh, clip))
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def encode_deltas(anchors, boxes):
    """Inverse of :func:`decode_deltas` (training targets)."""
    aw = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-6)
    ah = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-6)
    ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
    ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    bx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    by = (boxes[:, 1] + boxes[:, 3]) * 0.5
    return jnp.stack([(bx - ax) / aw, (by - ay) / ah,
                      jnp.log(bw / aw), jnp.log(bh / ah)], axis=-1)


class RPNHead(nn.Module):
    """Shared objectness/delta tower applied per pyramid level.

    ``packed=True`` concatenates the levels into ONE zero-gapped
    canvas and runs the tower once — exactly equal to the per-level
    application (the 3x3 SAME conv's zero padding at each level edge
    is reproduced by the >=2-px zero gaps).  Measured on v5e it is ~4%
    slower end-to-end than the per-level form (the canvas copy +
    output slicing outweigh the dispatch savings), so the default
    stays per-level; the packed path is kept for parity testing and
    narrower-level workloads.
    """

    num_anchors: int = 3
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, packed=False):
        conv = nn.Conv(self.features, (3, 3), padding="SAME",
                       dtype=self.dtype, name="tower")
        obj_head = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                           name="obj")
        delta_head = nn.Conv(self.num_anchors * 4, (1, 1),
                             dtype=self.dtype, name="delta")

        if packed and len(feats) > 1:
            gap = 2
            B = feats[0].shape[0]
            C = feats[0].shape[-1]
            H = max(f.shape[1] for f in feats)
            offs, x = [], 0
            for f in feats:
                offs.append(x)
                x += f.shape[2] + gap
            canvas = jnp.zeros((B, H, x - gap, C), feats[0].dtype)
            for f, off in zip(feats, offs):
                canvas = jax.lax.dynamic_update_slice(
                    canvas, f, (0, 0, off, 0))
            t = nn.relu(conv(canvas))
            obj_all = obj_head(t)
            delta_all = delta_head(t)
            objs, deltas = [], []
            for f, off in zip(feats, offs):
                h, w = f.shape[1], f.shape[2]
                objs.append(obj_all[:, :h, off:off + w])
                deltas.append(delta_all[:, :h, off:off + w])
            return objs, deltas

        # Per-level tower (3x3, needs spatial structure), then ONE
        # application of each 1x1 head over all levels' concatenated
        # pixels: the upper pyramid maps (16^2..4^2) are far below MXU
        # tile size, so 2 matmuls on [B, sum(HW), 1, C] replace 2xL
        # tiny convs at identical parameters and numerics.
        towers = [nn.relu(conv(x)) for x in feats]
        B = towers[0].shape[0]
        flat = jnp.concatenate(
            [t.reshape(B, -1, 1, t.shape[-1]) for t in towers], axis=1)
        obj_all = obj_head(flat)
        delta_all = delta_head(flat)
        objs, deltas = [], []
        p = 0
        for t in towers:
            h, w = t.shape[1], t.shape[2]
            objs.append(obj_all[:, p:p + h * w].reshape(B, h, w, -1))
            deltas.append(delta_all[:, p:p + h * w].reshape(B, h, w, -1))
            p += h * w
        return objs, deltas


def select_proposals(objs, deltas, anchors_per_level, image_hw,
                     pre_nms_topk=150, post_nms_topk=256, nms_thr=0.7,
                     exact_topk=False):
    """Batched proposal selection for ONE image, static shapes.

    Args:
      objs: list of ``[H, W, A]`` objectness maps.
      deltas: list of ``[H, W, A*4]`` delta maps.
      anchors_per_level: list of ``[H*W*A, 4]`` anchors.

    Returns ``(boxes[post_nms_topk, 4], scores[post_nms_topk])`` padded
    with zero scores.
    """
    all_boxes, all_scores = [], []
    for obj, delta, anchors in zip(objs, deltas, anchors_per_level):
        scores = obj.reshape(-1)
        k = min(pre_nms_topk, scores.shape[0])
        # approx_max_k: TPU-native partial sort, ~10x faster than exact
        # top_k; recall ~0.95 with default params, fine for proposal
        # pre-selection (Track-AP effect quantified by
        # tools/accuracy_study.py; exact_topk=True gives the
        # reference-exact behavior).
        if exact_topk:
            top_scores, idx = jax.lax.top_k(scores, k)
        else:
            top_scores, idx = jax.lax.approx_max_k(scores, k)
        boxes = decode_deltas(anchors[idx],
                              delta.reshape(-1, 4)[idx])
        h, w = image_hw
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h),
        ], axis=-1)
        all_boxes.append(boxes)
        all_scores.append(top_scores)
    boxes = jnp.concatenate(all_boxes)
    scores = jax.nn.sigmoid(jnp.concatenate(all_scores)
                            .astype(jnp.float32))
    keep = batched_nms(boxes.astype(jnp.float32), scores, nms_thr,
                       post_nms_topk)
    return boxes[keep], jnp.where(keep >= 0, scores[keep], 0.0)
