"""Siamese RPN training losses.

Capability-parity with reference ``pysot/models/loss.py``:
``select_cross_entropy_loss`` (CE averaged separately over sampled
positives and negatives) and ``weight_l1_loss`` (per-anchor weighted L1
on the regression deltas), composed as
``cls + lambda * loc`` (``model_builder.py:77-115``).

Everything is masked arithmetic over the fixed anchor grid — the
index_select gymnastics of the torch version become weight vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_cross_entropy(cls_logits, label, pos_weight, neg_weight):
    """CE over sampled anchors.

    Args:
      cls_logits: ``[N, 2]`` (bg, fg) logits.
      label: ``[N]`` +1/0/-1.
      pos_weight / neg_weight: ``[N]`` normalized sampling weights.
    """
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    pos_loss = -jnp.sum(logp[:, 1] * pos_weight)
    neg_loss = -jnp.sum(logp[:, 0] * neg_weight)
    return 0.5 * pos_loss + 0.5 * neg_loss


def weighted_l1(pred_delta, target_delta, pos_weight):
    """L1 on regression deltas, positives only, averaged."""
    diff = jnp.abs(pred_delta - target_delta)
    return jnp.sum(diff.sum(axis=-1) * pos_weight)


def select_mask_logistic_loss(mask_logits, gt_mask, pos_weight,
                              stride=8, patch=127, down=2):
    """SiamMask mask loss: soft-margin (logistic) loss on the mask
    patches at positive response locations.

    NOTE: the vendored reference leaves this unimplemented
    (``pysot/models/model_builder.py:110-114`` sets ``mask_loss =
    None`` with a TODO); this follows the SiamMask paper's formulation
    the stub was meant to hold: each response location (y, x) predicts
    a ``(patch/down)^2`` mask of the ``patch``-sized search-image
    window centred at its receptive-field centre; the loss is the
    per-pixel logistic loss averaged over the patch and over positive
    locations.

    Args:
      mask_logits: ``[B, S, S, P*P]`` per-location mask logits, where
        ``P = (patch + 1) // down``.
      gt_mask: ``[B, Hs, Ws]`` binary target mask in search-image
        coords.
      pos_weight: ``[B, S, S]`` nonnegative weights (positive anchor
        locations, normalized); zero rows contribute nothing.

    Returns scalar loss.
    """
    B, S, _, PP = mask_logits.shape
    P = int(round(PP ** 0.5))
    Hs = gt_mask.shape[1]
    # Downsample the GT mask, then extract one P x P window per
    # response location, CENTERED like the receptive field: location i
    # has center Hd/2 + (i - (S-1)/2) * stride/down.
    Hd = Hs // down
    g = jax.image.resize(gt_mask, (B, Hd, Hd), method="nearest")
    eff_stride = stride // down
    base = int(round(Hd / 2 - (S - 1) / 2 * eff_stride - P / 2))
    span = (S - 1) * eff_stride + P
    pad_lo = max(0, -base)
    pad_hi = max(0, base + span - Hd)
    g = jnp.pad(g, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi)))
    off = base + pad_lo
    g = g[:, off:off + span, off:off + span]
    patches = jax.lax.conv_general_dilated_patches(
        g[..., None], filter_shape=(P, P),
        window_strides=(eff_stride, eff_stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B, S, S, P*P]
    sign = 2.0 * patches - 1.0
    # log(1 + exp(-sign * logit)), averaged over patch pixels.
    per_loc = jnp.mean(jax.nn.softplus(-sign * mask_logits), axis=-1)
    return jnp.sum(per_loc * pos_weight) / jnp.maximum(
        jnp.sum(pos_weight), 1e-6)


def siamese_loss(outputs, targets, cls_weight=1.0, loc_weight=1.2,
                 mask_weight=36.0):
    """Total loss for one batch (already vmapped/meaned by caller).

    Args:
      outputs: dict with ``cls [B, S, S, 2A]``, ``loc [B, S, S, 4A]``.
      targets: dict from
        :func:`tao_amodal_tpu.train.anchor_target.assign_anchor_targets`
        batched to ``[B, N]``, with anchor order matching the
        ``(A, S*S)`` flattening used by the tracker.
    """
    B = outputs["cls"].shape[0]
    S = outputs["cls"].shape[1]
    A = outputs["cls"].shape[-1] // 2
    cls = outputs["cls"].reshape(B, S * S, A, 2)
    cls = cls.transpose(0, 2, 1, 3).reshape(B, -1, 2)
    loc = outputs["loc"].reshape(B, S * S, A, 4)
    loc = loc.transpose(0, 2, 1, 3).reshape(B, -1, 4)

    cls_losses = jax.vmap(select_cross_entropy)(
        cls, targets["label"], targets["pos_weight"],
        targets["neg_weight"])
    loc_losses = jax.vmap(weighted_l1)(
        loc, targets["delta"], targets["pos_weight"])
    cls_loss = jnp.mean(cls_losses)
    loc_loss = jnp.mean(loc_losses)
    total = cls_weight * cls_loss + loc_weight * loc_loss
    stats = {"cls_loss": cls_loss, "loc_loss": loc_loss}

    if "mask" in outputs and "mask_label" in targets:
        # Per-location positive weights: max over anchors at each
        # location ((A, S*S) anchor-major flattening -> [B, S, S]).
        pw = targets["pos_weight"].reshape(B, A, S, S).max(axis=1)
        mask_loss = select_mask_logistic_loss(
            outputs["mask"], targets["mask_label"], pw)
        total = total + mask_weight * mask_loss
        stats["mask_loss"] = mask_loss
    return total, stats
