"""Mask-based (segm) track mAP.

The reference evaluator's segm branch is non-functional (its per-frame
kernel unpacks RLE dicts as xywh boxes, reference ``eval.py:306-335``
feeding ``eval.py:27-48``), so there is no oracle to compare against.
Instead: :func:`track_mask_iou_matrix` is verified against a dense
numpy brute-force spec for all three IoU modes, and the evaluator path
is verified end-to-end on identity predictions (AP must be exactly 1)
plus a shape/flow check that non-rectangular gt masks actually change
the result vs bbox mode.
"""

import copy
import json

import numpy as np
import pytest

from fixture_gen import make_fixture

from tao_amodal_tpu.data.results import make_track_ids_unique
from tao_amodal_tpu.evaluation.track_eval import TrackMapEvaluator
from tao_amodal_tpu.ops import mask as mask_ops
from tao_amodal_tpu.ops.track_iou import track_mask_iou_matrix


def _random_rle_tracks(rng, n_tracks, n_frames, hw=(24, 31), p_blob=0.75):
    """Nested [T][F] lists of random-blob RLEs (None = absent)."""
    h, w = hw
    out = []
    for _ in range(n_tracks):
        row = []
        for _ in range(n_frames):
            if rng.rand() > p_blob:
                row.append(None)
                continue
            mask = np.zeros((h, w), np.uint8)
            y, x = rng.randint(0, h - 4), rng.randint(0, w - 4)
            bh, bw = rng.randint(2, h - y), rng.randint(2, w - x)
            mask[y:y + bh, x:x + bw] = 1
            if rng.rand() < 0.3:  # second blob: non-rectangular masks
                y2, x2 = rng.randint(0, h - 3), rng.randint(0, w - 3)
                mask[y2:y2 + 3, x2:x2 + 3] = 1
            row.append(mask_ops.encode(mask))
        out.append(row)
    return out


def _dense(rles, hw):
    """[T][F] RLE lists -> masks [T, F, h, w] + valid [T, F]."""
    T, F = len(rles), len(rles[0])
    masks = np.zeros((T, F) + hw, bool)
    valid = np.zeros((T, F), bool)
    for t in range(T):
        for f in range(F):
            if rles[t][f] is not None:
                masks[t, f] = mask_ops.decode(rles[t][f]).astype(bool)
                valid[t, f] = True
    return masks, valid


def _spec_matrix(dt_rles, gt_rles, mode, hw, vid_thr=0.5):
    dm, dv = _dense(dt_rles, hw)
    gm, gv = _dense(gt_rles, hw)
    D, G, F = len(dt_rles), len(gt_rles), dv.shape[1]
    out = np.zeros((D, G))
    for i in range(D):
        for j in range(G):
            inters, unions, both_u, per_frame, active = [], [], [], [], 0
            for f in range(F):
                d, g = dv[i, f], gv[j, f]
                if d or g:
                    active += 1
                if d and g:
                    inter = np.logical_and(dm[i, f], gm[j, f]).sum()
                    union = np.logical_or(dm[i, f], gm[j, f]).sum()
                    inters.append(inter)
                    unions.append(union)
                    both_u.append(union)
                    per_frame.append(inter / union if union else 0.0)
                elif d:
                    unions.append(dm[i, f].sum())
                elif g:
                    unions.append(gm[j, f].sum())
            if mode == "3d_iou":
                u = sum(unions)
                out[i, j] = sum(inters) / u if u > 0 else 0.0
            elif mode == "avg_iou":
                out[i, j] = (sum(per_frame) / active) if active else 0.0
            elif mode == "imagenetvid":
                matched = sum(
                    i_ > vid_thr * u_ for i_, u_ in zip(inters, both_u))
                out[i, j] = matched / active if active else 0.0
    return out


@pytest.mark.parametrize("mode", ["3d_iou", "avg_iou", "imagenetvid"])
def test_track_mask_iou_matrix_matches_spec(mode):
    rng = np.random.RandomState(7)
    hw = (24, 31)
    dt = _random_rle_tracks(rng, 5, 9, hw)
    gt = _random_rle_tracks(rng, 4, 9, hw)
    got = track_mask_iou_matrix(dt, gt, mode=mode)
    want = _spec_matrix(dt, gt, mode, hw)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_track_mask_iou_empty_sides():
    rng = np.random.RandomState(3)
    gt = _random_rle_tracks(rng, 2, 4)
    assert track_mask_iou_matrix([], gt).shape == (0, 2)
    assert track_mask_iou_matrix(gt, []).shape == (2, 0)


def _triangle_segmentations(gt):
    """Non-rectangular masks: the lower-left triangle of each box."""
    for ann in gt["annotations"]:
        x, y, w, h = ann["bbox"]
        ann["segmentation"] = [[x, y, x, y + h, x + w, y + h]]
    return gt


@pytest.fixture(scope="module")
def segm_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("segm_track")
    gt, preds = make_fixture(seed=11, num_videos=2, frames_per_video=8,
                             num_cats=4, tracks_per_video=4)
    gt = _triangle_segmentations(gt)
    make_track_ids_unique(preds)
    gt_path, pred_path = tmp / "gt.json", tmp / "preds.json"
    gt_path.write_text(json.dumps(gt))
    pred_path.write_text(json.dumps(preds))
    return str(gt_path), str(pred_path), gt


def test_segm_track_eval_runs_and_differs_from_bbox(segm_fixture):
    gt_path, pred_path, _ = segm_fixture
    segm = TrackMapEvaluator(gt_path, pred_path, iou_type="segm")
    segm.run()
    bbox = TrackMapEvaluator(gt_path, pred_path, iou_type="bbox")
    bbox.run()
    s, b = segm.get_results(), bbox.get_results()
    assert list(s.keys()) == list(b.keys())
    for v in s.values():
        assert v == -1 or 0.0 <= v <= 1.0
    # Triangle gt masks vs box-polygon dt masks: the IoUs (and thus the
    # mAP) must differ from pure-bbox geometry — proves masks flow
    # through the matching, not silently bbox-backed.
    assert any(not np.isclose(s[k], b[k]) for k in s)


def test_segm_track_eval_identity_predictions(segm_fixture):
    gt_path, _, gt = segm_fixture
    # Predictions = the ground truth itself (same masks, same tracks).
    vid_of = {im["id"]: im["video_id"] for im in gt["images"]}
    preds = []
    for ann in gt["annotations"]:
        ann = dict(ann, video_id=vid_of[ann["image_id"]])
        preds.append({
            "image_id": ann["image_id"],
            "category_id": ann["category_id"],
            "bbox": list(ann["bbox"]),
            "segmentation": copy.deepcopy(ann["segmentation"]),
            "score": 0.9,
            "track_id": ann["track_id"],
            "video_id": ann["video_id"],
        })
    ev = TrackMapEvaluator(gt_path, preds, iou_type="segm")
    ev.run()
    assert np.isclose(ev.get_results()["AP"], 1.0)
