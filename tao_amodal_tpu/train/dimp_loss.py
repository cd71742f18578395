"""DiMP offline meta-training actor.

Capability-parity with the reference's DiMPActor
(``pytracking/ltr/actors/tracking.py``): per training sequence, the
target filter is optimized on the *train* frames and evaluated on the
*test* frames; the outer loss combines classification response error
with IoUNet prediction error.  Because the inner optimizer
(:func:`tao_amodal_tpu.ops.optimization.gauss_newton_cg`) is plain
differentiable jax, meta-gradients flow through the filter
optimization automatically — no unrolled-optimizer plumbing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tao_amodal_tpu.models.dimp import classify, train_filter
from tao_amodal_tpu.trackers.dimp import gaussian_label


def response_targets(boxes_xyxy, feat_hw, out_hw, image_hw, sigma=2.0):
    """Gaussian response targets centered on each frame's box."""
    ih, iw = image_hw

    def one(box):
        cx = (box[0] + box[2]) / 2 / iw * out_hw
        cy = (box[1] + box[3]) / 2 / ih * out_hw
        return gaussian_label((out_hw, out_hw),
                              jnp.stack([cy, cx]), sigma=sigma)

    return jax.vmap(one)(boxes_xyxy)


def dimp_actor_loss(extractor_apply, iou_net, variables, batch,
                    filter_size=4, num_gn_iters=3, num_cg_iters=5,
                    iou_weight=1.0):
    """Meta-training loss for one batch of sequences.

    Args:
      extractor_apply: ``(vars, images [N, S, S, 3]) -> feats
        [N, h, w, C]``.
      iou_net: :class:`tao_amodal_tpu.models.dimp.IoUNet`.
      variables: dict with ``extractor`` and ``iou`` variable trees.
      batch: dict with per-sequence ``train_images [B, Ntr, S, S, 3]``,
        ``train_boxes [B, Ntr, 4]`` (xyxy, image coords),
        ``test_images [B, Nte, S, S, 3]``, ``test_boxes [B, Nte, 4]``.

    Returns (loss, metrics).
    """
    S = batch["train_images"].shape[2]

    def sequence_loss(tr_imgs, tr_boxes, te_imgs, te_boxes):
        tr_feats = extractor_apply(variables["extractor"], tr_imgs)
        te_feats = extractor_apply(variables["extractor"], te_imgs)
        h = tr_feats.shape[1]
        C = tr_feats.shape[-1]
        out_hw = h - filter_size + 1

        tr_labels = response_targets(tr_boxes, h, out_hw, (S, S))
        te_labels = response_targets(te_boxes, h, out_hw, (S, S))

        filt, _ = train_filter(tr_feats, tr_labels,
                               (filter_size, filter_size, C),
                               num_gn_iters=num_gn_iters,
                               num_cg_iters=num_cg_iters)
        resp = classify(te_feats, filt)
        cls_loss = jnp.mean((resp - te_labels) ** 2)

        # IoUNet: predict IoU of jittered test boxes, target = true IoU.
        scale = h / S
        mod_vec = iou_net.apply(
            variables["iou"], tr_feats[0], tr_boxes[0] * scale,
            spatial_scale=1.0, method="modulation")

        def iou_loss_frame(feat, box):
            jitter = jnp.array([[0.0, 0, 0, 0], [4.0, 4, 0, 0],
                                [-6.0, 0, 6, 0], [0.0, -8, 0, 8]])
            cands = box[None] + jitter
            pred = iou_net.apply(variables["iou"], feat,
                                 mod_vec, cands * scale,
                                 spatial_scale=1.0)
            from tao_amodal_tpu.ops.boxes import box_iou_matrix
            from tao_amodal_tpu.ops.boxes import xyxy_to_xywh

            true = box_iou_matrix(xyxy_to_xywh(cands),
                                  xyxy_to_xywh(box[None]))[:, 0]
            return jnp.mean((pred - true) ** 2)

        iou_l = jnp.mean(jax.vmap(iou_loss_frame)(te_feats, te_boxes))
        return cls_loss, iou_l

    cls_losses, iou_losses = jax.vmap(sequence_loss)(
        batch["train_images"], batch["train_boxes"],
        batch["test_images"], batch["test_boxes"])
    cls_loss = jnp.mean(cls_losses)
    iou_loss = jnp.mean(iou_losses)
    total = cls_loss + iou_weight * iou_loss
    return total, {"dimp_cls": cls_loss, "dimp_iou": iou_loss}
