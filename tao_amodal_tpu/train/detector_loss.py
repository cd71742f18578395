"""Detector + expander training loss (the flagship train step).

A real composite objective over the ClipDetector's raw heads:
  * RPN: sigmoid-BCE objectness + smooth-L1 deltas against per-anchor
    matched gt (vectorized IoU matching, top-1 anchor forcing);
  * RoI head: softmax CE over classes + smooth-L1 box refinement on
    teacher-forced proposals (gt boxes, jittered gt, and random
    background boxes — static shapes, no dynamic sampling);
  * Amodal Expander: L1 between predicted amodal box and gt amodal box
    on the SAME box-head fc features inference feeds it
    (``roi_features`` in :meth:`ClipDetector._frame_detect`), so the
    expander sees one feature distribution train and test.

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

    # RoI box head + expander on teacher-forced proposals: gt boxes,
    # two jittered copies, and one random box per gt slot (static
    # [4G, 4] proposal set; labels by IoU >= 0.5, column 0 =
    # background).  The expander trains on the box head's fc features
    # — the exact tensor inference hands it as ``roi_features``.
    H_img, W_img = images.shape[1], images.shape[2]
    keys = jax.random.split(rng, B)

    def roi_frame(i, key):
        gt = batch["gt_boxes"][i]
        gt_valid = batch["gt_valid"][i]
        gt_cls = batch["gt_classes"][i]
        G = gt.shape[0]
        wh = jnp.concatenate([gt[:, 2:] - gt[:, :2]] * 2, axis=-1)
        k1, k2 = jax.random.split(key)
        jit_a = gt + 0.10 * jax.random.normal(k1, (G, 4)) * wh
        jit_b = gt + 0.25 * jax.random.normal(k2, (G, 4)) * wh
        rand_xy = jax.random.uniform(
            k2, (G, 2), minval=0.0,
            maxval=jnp.asarray([W_img * 0.8, H_img * 0.8]))
        rand_wh = jax.random.uniform(
            k1, (G, 2), minval=8.0,
            maxval=jnp.asarray([W_img * 0.2, H_img * 0.2]))
        rand_box = jnp.concatenate([rand_xy, rand_xy + rand_wh], -1)
        props = jnp.concatenate([gt, jit_a, jit_b, rand_box])  # [4G,4]
        props = jnp.stack([
            jnp.clip(props[:, 0], 0, W_img),
            jnp.clip(props[:, 1], 0, H_img),
            jnp.clip(props[:, 2], 0, W_img),
            jnp.clip(props[:, 3], 0, H_img)], axis=-1)

        iou = _iou_xyxy(props, gt)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)
        pos = best_iou >= 0.5
        labels = jnp.where(pos, gt_cls[best_gt], 0)  # 0 = background

        # Inference-exact pooling (same levels + canonical level as
        # ClipDetector._frame_detect) — see ClipDetector.pool_rois.
        pooled = detector.pool_rois([lvl[i] for lvl in pyramid], props)
        logits, bdeltas, feats = detector.apply(
            variables["detector"], pooled,
            method=lambda m, x: m.box_head(x))

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
        cls_loss = jnp.mean(ce)

        tgt = encode_deltas(props, gt[best_gt])
        box_l1 = smooth_l1(bdeltas.astype(jnp.float32) - tgt).sum(-1)
        n_pos = jnp.maximum(jnp.sum(pos), 1)
        box_loss = jnp.sum(box_l1 * pos) / n_pos

        amodal, _ = expander.apply(
            variables["expander"], feats, props,
            image_hw=(H_img, W_img))
        l1 = jnp.abs(amodal - batch["gt_amodal"][i][best_gt]).sum(-1)
        exp_loss = jnp.sum(l1 * pos) / n_pos
        return cls_loss, box_loss, exp_loss

    cls_losses, box_losses, exp_losses = jax.vmap(roi_frame)(
        jnp.arange(B), keys)
    cls_loss = jnp.mean(cls_losses)
    box_loss = jnp.mean(box_losses)
    exp_loss = jnp.mean(exp_losses)

    total = obj_loss + reg_loss + cls_loss + box_loss + 0.1 * exp_loss
    return total, {"rpn_obj": obj_loss, "rpn_reg": reg_loss,
                   "roi_cls": cls_loss, "roi_box": box_loss,
                   "expander_l1": exp_loss}
