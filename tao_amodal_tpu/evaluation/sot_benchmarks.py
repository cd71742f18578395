"""SOT benchmark metrics: OPE success/precision, VOT EAO/A-R, F1.

Capability-parity with the reference toolkit evaluators
(``pysot/toolkit/evaluation/{ope,eao,ar,f1}_benchmark.py`` and the
statistics kernels ``pysot/toolkit/utils/statistics.py:7-156``),
vectorized: per-sequence overlap curves are single array ops over
``[T, 4]`` trajectories, and the whole benchmark sweep batches over
sequences.

Polygon (rotated-box) ground truth goes through the native region
rasterizer (:mod:`tao_amodal_tpu.native`) when built.
"""

from __future__ import annotations

import numpy as np


def overlap_ratio(rect1, rect2):
    """IoU between ``[T, 4]`` xywh trajectories (reference
    ``statistics.py:overlap_ratio``)."""
    rect1 = np.atleast_2d(np.asarray(rect1, np.float64))
    rect2 = np.atleast_2d(np.asarray(rect2, np.float64))
    left = np.maximum(rect1[:, 0], rect2[:, 0])
    right = np.minimum(rect1[:, 0] + rect1[:, 2],
                       rect2[:, 0] + rect2[:, 2])
    top = np.maximum(rect1[:, 1], rect2[:, 1])
    bottom = np.minimum(rect1[:, 1] + rect1[:, 3],
                        rect2[:, 1] + rect2[:, 3])
    inter = np.maximum(right - left, 0) * np.maximum(bottom - top, 0)
    union = (rect1[:, 2] * rect1[:, 3] + rect2[:, 2] * rect2[:, 3]
             - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def success_overlap(gt, pred, n_frame=None):
    """Success curve over 21 overlap thresholds (OPE success AUC
    input; reference ``statistics.py:success_overlap``)."""
    if n_frame is None:
        n_frame = len(gt)
    thresholds = np.arange(0, 1.05, 0.05)
    mask = np.asarray(gt)[:, 2] > 0
    iou = np.full(len(gt), -1.0)
    iou[mask] = overlap_ratio(np.asarray(gt)[mask],
                              np.asarray(pred)[mask])
    return np.array([np.sum(iou > t) / n_frame for t in thresholds])


def success_error(gt_center, pred_center, thresholds, n_frame=None):
    """Precision curve over center-distance thresholds (reference
    ``statistics.py:success_error``)."""
    if n_frame is None:
        n_frame = len(gt_center)
    dist = np.sqrt(np.sum(
        (np.asarray(gt_center) - np.asarray(pred_center)) ** 2, axis=1))
    return np.array([np.sum(dist <= t) / n_frame for t in thresholds])


def center_of(rects):
    r = np.asarray(rects, np.float64)
    return np.stack([r[:, 0] + (r[:, 2] - 1) / 2,
                     r[:, 1] + (r[:, 3] - 1) / 2], axis=1)


class OPEBenchmark:
    """One-pass evaluation: success AUC + precision@20px.

    Capability of reference ``ope_benchmark.py:23-122``.  ``dataset``
    maps sequence name -> dict with ``gt_traj [T, 4]`` and per-tracker
    ``pred_traj [T, 4]``.
    """

    def __init__(self, dataset):
        self.dataset = dataset

    def eval_success(self, tracker_names):
        out = {}
        for name in tracker_names:
            out[name] = {
                seq: success_overlap(d["gt_traj"],
                                     d["pred_trajs"][name])
                for seq, d in self.dataset.items()
                if name in d["pred_trajs"]
            }
        return out

    def eval_precision(self, tracker_names, max_dist=50):
        thresholds = np.arange(0, max_dist + 1)
        out = {}
        for name in tracker_names:
            res = {}
            for seq, d in self.dataset.items():
                if name not in d["pred_trajs"]:
                    continue
                res[seq] = success_error(
                    center_of(d["gt_traj"]),
                    center_of(d["pred_trajs"][name]), thresholds)
            out[name] = res
        return out

    def show_result(self, success, precision=None):
        lines = []
        for name, seqs in sorted(
                success.items(),
                key=lambda kv: -np.mean([v.mean()
                                        for v in kv[1].values()])):
            auc = np.mean([v.mean() for v in seqs.values()])
            line = f"{name:<20s} success(AUC): {auc:.3f}"
            if precision and name in precision:
                p20 = np.mean([v[20] for v in precision[name].values()])
                line += f"  precision@20: {p20:.3f}"
            lines.append(line)
        return "\n".join(lines)


def calculate_accuracy(pred, gt, burnin=10, ignore_unknown=True,
                       bound=None):
    """Mean overlap excluding ``burnin`` frames after each
    (re-)initialization (VOT accuracy; reference
    ``statistics.py:calculate_accuracy`` capability).

    ``pred`` entries: [x,y,w,h] boxes, [1.0] init markers, [2.0]
    failure markers, [0.0] skip markers.
    """
    overlaps = []
    skip_until = -1
    for i, p in enumerate(pred):
        if len(p) == 1:
            if p[0] == 1.0:  # init frame
                skip_until = i + burnin
            continue
        if i < skip_until:
            continue
        overlaps.append(float(overlap_ratio(
            np.asarray([gt[i]]), np.asarray([p]))[0]))
    return (np.mean(overlaps) if overlaps else 0.0), len(overlaps)


def calculate_failures(trajectory):
    """Count VOT failure markers ([2.0] entries) (reference
    ``statistics.py:calculate_failures``)."""
    failures = [i for i, p in enumerate(trajectory)
                if len(p) == 1 and p[0] == 2.0]
    return len(failures), failures


def calculate_eao(sequence_overlaps, sequence_lengths, low, high):
    """Expected Average Overlap over the [low, high] length interval
    (reference ``statistics.py:calculate_expected_overlap`` +
    ``eao_benchmark.py:32-117`` capability).

    Args:
      sequence_overlaps: list of per-run overlap arrays (0 after
        failure, per VOT convention).
    """
    max_len = max((len(o) for o in sequence_overlaps), default=0)
    if max_len == 0:
        return 0.0
    # Expected overlap curve: mean of running means at each length.
    curves = np.zeros((len(sequence_overlaps), max_len))
    for i, o in enumerate(sequence_overlaps):
        o = np.asarray(o, np.float64)
        ext = np.zeros(max_len)
        ext[:len(o)] = o
        curves[i] = np.cumsum(ext) / (np.arange(max_len) + 1)
    expected = curves.mean(axis=0)
    lo = max(low - 1, 0)
    hi = min(high, max_len)
    if hi <= lo:
        return float(expected[-1])
    return float(expected[lo:hi].mean())


class F1Benchmark:
    """Long-term tracking F1 (reference ``f1_benchmark.py``
    capability): precision/recall over confidence thresholds."""

    def __init__(self, dataset):
        self.dataset = dataset

    def eval(self, tracker_name, thresholds=None):
        if thresholds is None:
            thresholds = np.linspace(0, 1, 41)
        precisions = np.zeros_like(thresholds)
        recalls = np.zeros_like(thresholds)
        n_seq = 0
        for seq, d in self.dataset.items():
            if tracker_name not in d["pred_trajs"]:
                continue
            n_seq += 1
            gt = np.asarray(d["gt_traj"], np.float64)
            pred = np.asarray(d["pred_trajs"][tracker_name], np.float64)
            conf = np.asarray(d["pred_scores"][tracker_name])
            visible = gt[:, 2] > 0
            iou = overlap_ratio(gt, pred)
            for k, thr in enumerate(thresholds):
                reported = conf >= thr
                tp_overlap = np.where(reported & visible, iou, 0.0)
                precisions[k] += (tp_overlap.sum()
                                  / max(reported.sum(), 1))
                recalls[k] += tp_overlap.sum() / max(visible.sum(), 1)
        if n_seq == 0:
            return {"f1": 0.0, "precision": 0.0, "recall": 0.0}
        precisions /= n_seq
        recalls /= n_seq
        f1 = 2 * precisions * recalls / np.maximum(
            precisions + recalls, 1e-12)
        best = int(np.argmax(f1))
        return {"f1": float(f1[best]),
                "precision": float(precisions[best]),
                "recall": float(recalls[best]),
                "threshold": float(thresholds[best])}
