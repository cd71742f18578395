"""Greedy NMS as a fixed-shape XLA program.

Device-side replacement for the reference's C ``bbNms``/``rleNms``
(``maskApi.c:98-132``): score-sorted greedy suppression implemented as a
``fori_loop`` over a fixed output budget with a suppression mask carry —
no dynamic shapes, fully jit/vmap-able (vmap over batch/class).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _iou_xyxy(box, boxes):
    x0 = jnp.maximum(box[0], boxes[:, 0])
    y0 = jnp.maximum(box[1], boxes[:, 1])
    x1 = jnp.minimum(box[2], boxes[:, 2])
    y1 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0),
                     0.0)


@partial(jax.jit, static_argnames=("max_out",))
def batched_nms(boxes, scores, iou_thr, max_out):
    """Greedy NMS; returns ``[max_out]`` indices into ``boxes``,
    ``-1`` for exhausted slots (callers mask with ``keep >= 0``)."""

    def body(i, carry):
        keep, alive = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        any_alive = jnp.any(alive)
        keep = keep.at[i].set(jnp.where(any_alive, best, -1))
        ious = _iou_xyxy(boxes[best], boxes)
        alive = alive & (ious <= iou_thr)
        alive = alive.at[best].set(False)
        return keep, alive

    keep0 = jnp.zeros((max_out,), jnp.int32)
    alive0 = scores > -jnp.inf
    keep, _ = jax.lax.fori_loop(0, max_out, body, (keep0, alive0))
    return keep


@partial(jax.jit, static_argnames=("max_out",))
def class_aware_nms(boxes, scores, classes, iou_thr, max_out):
    """Per-class NMS via the coordinate-offset trick: boxes of
    different classes are translated far apart so one greedy pass
    suppresses only within-class."""
    offset = classes.astype(boxes.dtype)[:, None] * 1e5
    return batched_nms(boxes + offset, scores, iou_thr, max_out)
