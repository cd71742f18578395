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


def siamese_loss(outputs, targets, cls_weight=1.0, loc_weight=1.2):
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
    return total, {"cls_loss": cls_loss, "loc_loss": loc_loss}
