"""Fixpoint NMS == sequential greedy NMS (spec oracle), including
suppression chains deeper than the unrolled round budget."""

import jax.numpy as jnp
import numpy as np
import pytest

from tao_amodal_tpu.ops.nms import (
    batched_nms,
    class_aware_nms,
    nms_keep_mask,
)

pytestmark = pytest.mark.fast


def sequential_nms(boxes, scores, thr, valid=None):
    n = len(boxes)
    if valid is None:
        valid = np.ones(n, bool)
    order = sorted(range(n), key=lambda i: (-scores[i], i))
    keep = np.zeros(n, bool)
    for i in order:
        if not valid[i]:
            continue
        ok = True
        for j in range(n):
            if keep[j] and _iou(boxes[i], boxes[j]) > thr:
                ok = False
                break
        keep[i] = ok
    return keep


def _iou(a, b):
    x0, y0 = max(a[0], b[0]), max(a[1], b[1])
    x1, y1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x1 - x0, 0) * max(y1 - y0, 0)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


def test_random_instances_match_sequential_oracle():
    rs = np.random.RandomState(0)
    for trial in range(20):
        n = rs.randint(1, 60)
        xy = rs.rand(n, 2) * 80
        wh = rs.rand(n, 2) * 40 + 5
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rs.rand(n).astype(np.float32)
        valid = rs.rand(n) > 0.2
        want = sequential_nms(boxes, scores, 0.5, valid)
        got = np.asarray(nms_keep_mask(jnp.asarray(boxes),
                                       jnp.asarray(scores), 0.5,
                                       valid=jnp.asarray(valid)))
        np.testing.assert_array_equal(got, want, err_msg=f"t{trial}")


def test_deep_suppression_chain_exceeds_unrolled_rounds():
    """A 24-box chain (box i overlaps only its neighbors, scores
    descending) needs ~12 Jacobi rounds > the 8 unrolled — the
    while_loop residual must finish it exactly: alternate boxes
    survive."""
    n = 24
    # Spacing 4 on width-10 boxes: neighbor IoU = 6/14 = 0.43 > thr,
    # next-but-one IoU = 2/18 = 0.11 < thr — a pure nearest-neighbor
    # chain.
    boxes = np.stack([np.arange(n) * 4.0, np.zeros(n),
                      np.arange(n) * 4.0 + 10, np.full(n, 10.0)],
                     -1).astype(np.float32)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    want = sequential_nms(boxes, scores, 0.3)
    got = np.asarray(nms_keep_mask(jnp.asarray(boxes),
                                   jnp.asarray(scores), 0.3))
    np.testing.assert_array_equal(got, want)
    assert want[::2].all() and not want[1::2].any()
    # Zero unrolled rounds (pure while_loop) agrees too.
    got0 = np.asarray(nms_keep_mask(jnp.asarray(boxes),
                                    jnp.asarray(scores), 0.3,
                                    unrolled_rounds=0))
    np.testing.assert_array_equal(got0, want)


def test_batched_and_class_aware_wrappers():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                         [40, 40, 50, 50]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx = np.asarray(batched_nms(boxes, scores, 0.5, 3))
    assert list(idx) == [0, 2, -1]
    # Different classes: the overlapping pair both survive.
    classes = jnp.asarray([0, 1, 0])
    idx2 = np.asarray(class_aware_nms(boxes, scores, classes, 0.5, 3))
    assert sorted(i for i in idx2 if i >= 0) == [0, 1, 2]
