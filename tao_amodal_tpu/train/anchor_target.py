"""Anchor target assignment, fully vectorized.

Capability-parity with the reference ``AnchorTarget``
(``pysot/datasets/anchor_target.py:15-76``): label anchors by IoU
against the single gt box (positive above ``thr_high``, negative below
``thr_low``, rest ignored), subsample to a fixed positive budget and a
fixed total budget, and emit regression deltas + per-anchor weights.

TPU twist: subsampling uses the random-keyed top-k trick (add uniform
noise, take top-k of the masked scores) instead of np.random.choice —
deterministic shapes, runs inside jit on device, vmaps over the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _iou_cxcywh(anchors, box):
    """IoU of ``[N, 4]`` (cx, cy, w, h) anchors vs one (cx, cy, w, h)."""
    ax0 = anchors[:, 0] - anchors[:, 2] / 2
    ay0 = anchors[:, 1] - anchors[:, 3] / 2
    ax1 = anchors[:, 0] + anchors[:, 2] / 2
    ay1 = anchors[:, 1] + anchors[:, 3] / 2
    bx0, by0 = box[0] - box[2] / 2, box[1] - box[3] / 2
    bx1, by1 = box[0] + box[2] / 2, box[1] + box[3] / 2
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0)
    inter = iw * ih
    union = (anchors[:, 2] * anchors[:, 3] + box[2] * box[3] - inter)
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def _subsample(mask, budget, rng):
    """Keep at most ``budget`` True entries, chosen uniformly."""
    n = mask.shape[0]
    noise = jax.random.uniform(rng, (n,))
    score = jnp.where(mask, noise, -1.0)
    thresh_idx = jnp.minimum(budget, jnp.sum(mask)) - 1
    sorted_scores = jnp.sort(score)[::-1]
    cutoff = sorted_scores[jnp.maximum(thresh_idx, 0)]
    keep = mask & (score >= cutoff) & (thresh_idx >= 0)
    return keep


@partial(jax.jit, static_argnames=("num_pos", "num_total"))
def assign_anchor_targets(anchors, gt_box, rng, thr_high=0.6,
                          thr_low=0.3, num_pos=16, num_total=64):
    """Targets for one training pair.

    Args:
      anchors: ``[N, 4]`` (cx, cy, w, h).
      gt_box: ``[4]`` (cx, cy, w, h).

    Returns dict with ``label`` (+1 pos / 0 neg / -1 ignore),
    ``delta [N, 4]`` regression targets, ``pos_weight`` / ``neg_weight``
    normalized sample weights.
    """
    iou = _iou_cxcywh(anchors, gt_box)
    pos = iou > thr_high
    neg = iou < thr_low

    r_pos, r_neg = jax.random.split(rng)
    pos_keep = _subsample(pos, num_pos, r_pos)
    n_pos = jnp.sum(pos_keep)
    neg_budget = num_total - jnp.minimum(n_pos, num_pos)
    neg_noise = jax.random.uniform(r_neg, neg.shape)
    neg_score = jnp.where(neg, neg_noise, -1.0)
    cutoff_idx = jnp.maximum(jnp.minimum(neg_budget,
                                         jnp.sum(neg)) - 1, 0)
    neg_cut = jnp.sort(neg_score)[::-1][cutoff_idx]
    neg_keep = neg & (neg_score >= neg_cut) & (neg_budget > 0)

    label = jnp.where(pos_keep, 1, jnp.where(neg_keep, 0, -1))

    delta = jnp.stack([
        (gt_box[0] - anchors[:, 0]) / jnp.maximum(anchors[:, 2], 1e-6),
        (gt_box[1] - anchors[:, 1]) / jnp.maximum(anchors[:, 3], 1e-6),
        jnp.log(jnp.maximum(gt_box[2], 1e-6)
                / jnp.maximum(anchors[:, 2], 1e-6))
        * jnp.ones_like(anchors[:, 2]),
        jnp.log(jnp.maximum(gt_box[3], 1e-6)
                / jnp.maximum(anchors[:, 3], 1e-6))
        * jnp.ones_like(anchors[:, 3]),
    ], axis=-1)

    pos_weight = pos_keep / jnp.maximum(n_pos, 1)
    neg_weight = neg_keep / jnp.maximum(jnp.sum(neg_keep), 1)
    return {"label": label, "delta": delta, "pos_weight": pos_weight,
            "neg_weight": neg_weight, "iou": iou}
