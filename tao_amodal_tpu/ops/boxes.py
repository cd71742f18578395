"""Batched box geometry in ``[x, y, w, h]`` (COCO) convention.

These are the TPU-native replacements for the reference's scalar kernels:
the numba ``bb_intersect_union`` (reference
``tao_amodal/evaluation/tao_amodal/eval.py:15-48``) and the C ``bbIou``
(reference ``.../pycocotools/common/maskApi.c:109-121``).  Everything here
is elementwise/broadcast math over ``[..., 4]`` tensors so it vectorizes on
the VPU and fuses under jit; no data-dependent shapes.

All functions take an ``xp`` namespace argument (``jax.numpy`` by
default).  Passing ``numpy`` runs the identical formulas on host in
float64 — the evaluator's parity path uses that, since the reference
computes IoUs in float64 and greedy matching is tie-sensitive.
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(boxes, xp=jnp):
    """``[x, y, w, h] -> [x1, y1, x2, y2]`` over the last axis."""
    x, y, w, h = xp.split(boxes, 4, axis=-1)
    return xp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(boxes, xp=jnp):
    """``[x1, y1, x2, y2] -> [x, y, w, h]`` over the last axis."""
    x1, y1, x2, y2 = xp.split(boxes, 4, axis=-1)
    return xp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def box_area(boxes):
    """Area ``w * h`` of ``[..., 4]`` xywh boxes -> ``[...]``."""
    return boxes[..., 2] * boxes[..., 3]


def box_intersect_union(d, g, xp=jnp):
    """Elementwise intersection and union of broadcastable xywh boxes.

    Matches the semantics of the reference's ``bb_intersect_union``
    (``tao_amodal/evaluation/tao_amodal/eval.py:15-48``): returns the pair
    ``(intersection, union)`` where ``union = area_d + area_g - inter``.

    Args:
      d: ``[..., 4]`` detection boxes, xywh.
      g: ``[..., 4]`` groundtruth boxes, xywh (broadcastable against ``d``).

    Returns:
      ``(inter, union)`` arrays with the broadcast shape of ``d``/``g``
      minus the last axis.
    """
    dx, dy, dw, dh = (d[..., i] for i in range(4))
    gx, gy, gw, gh = (g[..., i] for i in range(4))

    left = xp.maximum(dx, gx)
    right = xp.minimum(dx + dw, gx + gw)
    top = xp.maximum(dy, gy)
    bottom = xp.minimum(dy + dh, gy + gh)

    iw = xp.maximum(right - left, 0.0)
    ih = xp.maximum(bottom - top, 0.0)
    inter = iw * ih
    union = dw * dh + gw * gh - inter
    return inter, union


def box_iou_matrix(dt, gt, iscrowd=None, xp=jnp):
    """Pairwise IoU matrix between xywh boxes.

    Replaces the per-pair C loop of ``bbIou`` (reference ``maskApi.c:109``):
    one broadcast op produces the whole ``[D, G]`` matrix.  With
    ``iscrowd[g]`` true the denominator is the detection area alone,
    mirroring the COCO crowd convention.

    Args:
      dt: ``[D, 4]`` detections.
      gt: ``[G, 4]`` groundtruths.
      iscrowd: optional ``[G]`` bool.

    Returns:
      ``[D, G]`` float IoU matrix.
    """
    inter, union = box_intersect_union(dt[:, None, :], gt[None, :, :], xp=xp)
    if iscrowd is not None:
        crowd = xp.asarray(iscrowd, bool)[None, :]
        dt_area = box_area(dt)[:, None]
        union = xp.where(crowd, dt_area, union)
    return xp.where(union > 0, inter / xp.where(union > 0, union, 1.0), 0.0)
