"""Greedy NMS as parallel fixpoint iteration (TPU-friendly, exact).

Device-side replacement for the reference's C ``bbNms``/``rleNms``
(``maskApi.c:98-132``).  Greedy NMS is the unique solution of the
acyclic recurrence

    keep[j] = not exists i ranked-above j with keep[i] and IoU > thr

Jacobi-iterating that recurrence converges to the greedy result in at
most chain-depth rounds (typically < 8); each round is one [N, N]
masked reduction — dense vector work instead of an N-step sequential
``fori_loop``, which is what makes it fast on TPU.  A ``while_loop``
with a no-change early exit guarantees exactness.

Ranking is (score desc, index asc) — identical tie behavior to
score-sorted sequential NMS.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pairwise_iou_xyxy(boxes):
    x0 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y0 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x1 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y1 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    area = ((boxes[:, 2] - boxes[:, 0])
            * (boxes[:, 3] - boxes[:, 1]))
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0),
                     0.0)


@partial(jax.jit, static_argnames=("unrolled_rounds",))
def nms_keep_mask(boxes, scores, iou_thr, valid=None,
                  unrolled_rounds=8):
    """Exact greedy-NMS keep mask via fixpoint iteration.

    Args:
      boxes: ``[N, 4]`` xyxy.  The pairwise IoU matrix inherits the
        boxes' dtype — pass bf16 boxes to halve the [N, N] HBM traffic
        (suppression thresholds tolerate bf16; keep f32 where exact
        tie behavior matters).
      scores: ``[N]``; entries with ``valid=False`` never kept.
      unrolled_rounds: Jacobi rounds emitted as straight-line code
        before the early-exit while_loop takes over — the loop usually
        runs ZERO iterations (convergence needs chain-depth rounds,
        typically < 8), and on the serving path a dynamic-trip-count
        loop is a serialization point XLA cannot fuse across (same
        finding as the SORT greedy gate, experiments/
        sort_scan_bench.py).  The body is idempotent at the fixpoint,
        so extra unrolled rounds never change the result and the
        while_loop residual guarantees exactness for adversarially
        deep chains.

    Returns ``[N]`` bool keep mask, identical to score-sorted
    sequential greedy NMS.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    iou = _pairwise_iou_xyxy(boxes)
    idx = jnp.arange(n)
    ranked_above = ((scores[:, None] > scores[None, :])
                    | ((scores[:, None] == scores[None, :])
                       & (idx[:, None] < idx[None, :])))
    sup = (iou > iou_thr) & ranked_above & valid[:, None]

    def cond(carry):
        keep, prev, rounds = carry
        return jnp.any(keep != prev) & (rounds < n)

    def body(carry):
        keep, _, rounds = carry
        new_keep = valid & ~jnp.any(sup & keep[:, None], axis=0)
        return new_keep, keep, rounds + 1

    carry = (valid, jnp.zeros_like(valid),
             jnp.zeros((), jnp.int32))
    for _ in range(min(unrolled_rounds, n)):
        carry = body(carry)
    keep, _, _ = jax.lax.while_loop(cond, body, carry)
    return keep


@partial(jax.jit, static_argnames=("max_out",))
def batched_nms(boxes, scores, iou_thr, max_out, valid=None):
    """NMS returning the top-``max_out`` surviving indices by score;
    ``-1`` marks exhausted slots."""
    keep = nms_keep_mask(boxes, scores, iou_thr, valid=valid)
    masked = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, max_out)
    return jnp.where(top_scores > -jnp.inf, top_idx, -1)


@partial(jax.jit, static_argnames=("max_out",))
def class_aware_nms(boxes, scores, classes, iou_thr, max_out,
                    valid=None):
    """Per-class NMS via the coordinate-offset trick: boxes of
    different classes are translated far apart so one pass suppresses
    only within-class."""
    offset = classes.astype(boxes.dtype)[:, None] * 1e5
    return batched_nms(boxes + offset, scores, iou_thr, max_out,
                       valid=valid)
