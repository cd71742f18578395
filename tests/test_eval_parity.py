"""End-to-end metric parity vs the reference evaluators.

Runs the reference TaoEval / LVISEval (imported from /root/reference with
leaf-dependency shims, see reference_oracle.py) and our evaluators on the
same synthetic fixture and requires identical metric dictionaries.
"""

import copy
import json

import numpy as np
import pytest

from fixture_gen import make_fixture
from reference_oracle import load_reference

from tao_amodal_tpu.data.results import make_track_ids_unique
from tao_amodal_tpu.evaluation import (
    AmodalDetectionEvaluator,
    TrackMapEvaluator,
)


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fixture")
    gt, preds = make_fixture(seed=0)
    make_track_ids_unique(preds)
    gt_path = tmp / "gt.json"
    pred_path = tmp / "preds.json"
    gt_path.write_text(json.dumps(gt))
    pred_path.write_text(json.dumps(preds))
    return str(gt_path), str(pred_path), gt, preds


def _compare_results(ref_results, our_results):
    assert list(ref_results.keys()) == list(our_results.keys())
    for key in ref_results:
        r, o = ref_results[key], our_results[key]
        assert np.isclose(r, o, atol=1e-9), (key, r, o)


def test_track_map_parity(fixture_files):
    gt_path, pred_path, _, _ = fixture_files
    ref_tao, _ = load_reference()

    ref_gt = ref_tao.Tao(gt_path)
    ref_preds = json.load(open(pred_path))
    ref_eval = ref_tao.TaoEval(ref_gt, copy.deepcopy(ref_preds))
    ref_eval.run()

    ours = TrackMapEvaluator(gt_path, pred_path)
    ours.run()

    _compare_results(ref_eval.get_results(), ours.get_results())


@pytest.mark.parametrize("iou_3d_type", ["avg_iou", "imagenetvid"])
def test_track_map_parity_alt_iou(fixture_files, iou_3d_type):
    gt_path, pred_path, _, _ = fixture_files
    ref_tao, _ = load_reference()

    ref_eval = ref_tao.TaoEval(ref_tao.Tao(gt_path),
                               json.load(open(pred_path)),
                               iou_3d_type=iou_3d_type)
    ref_eval.run()
    ours = TrackMapEvaluator(gt_path, pred_path, iou_3d_type=iou_3d_type)
    ours.run()
    _compare_results(ref_eval.get_results(), ours.get_results())


def test_detection_parity(fixture_files):
    gt_path, pred_path, _, _ = fixture_files
    _, ref_lvis = load_reference()

    ref_eval = ref_lvis.LVISEval(gt_path, pred_path, "bbox")
    ref_eval.run()

    ours = AmodalDetectionEvaluator(gt_path, pred_path, "bbox")
    ours.run()

    _compare_results(ref_eval.get_results(), ours.get_results())


def test_make_track_ids_unique_matches_reference():
    gt, preds = make_fixture(seed=3)
    ours = copy.deepcopy(preds)
    n_ours = make_track_ids_unique(ours)

    # Reference implementation lives in the CLI script; re-run its
    # algorithm through the oracle import is impractical (module-level
    # argparse), so verify the invariants instead: ids unique per video,
    # first-video keeps original id, same multiset of (video, frames).
    assert n_ours > 0  # fixture is built to contain collisions
    vid_of = {}
    for ann in ours:
        t = ann["track_id"]
        vid_of.setdefault(t, ann["video_id"])
        assert vid_of[t] == ann["video_id"]
    # Annotation count preserved and per-video grouping unchanged.
    assert len(ours) == len(preds)
    for a, b in zip(preds, ours):
        assert a["video_id"] == b["video_id"]
        assert a["bbox"] == b["bbox"]


def test_track_map_parity_use_cats_0(fixture_files):
    """Category-agnostic mode (params.use_cats = 0)."""
    gt_path, pred_path, _, _ = fixture_files
    ref_tao, _ = load_reference()

    ref_eval = ref_tao.TaoEval(ref_tao.Tao(gt_path),
                               json.load(open(pred_path)))
    ref_eval.params.use_cats = 0
    ref_eval.run()
    ours = TrackMapEvaluator(gt_path, pred_path)
    ours.params.use_cats = 0
    ours.run()
    _compare_results(ref_eval.get_results(), ours.get_results())
