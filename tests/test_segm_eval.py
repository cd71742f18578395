"""Segmentation-type evaluation path (RLE/polygon IoU through our
codec) — parity vs the reference evaluator with the same codec shimmed
in (validates the evaluator plumbing; the codec itself is validated
independently in test_mask/test_native)."""

import copy
import json

import numpy as np
import pytest

from fixture_gen import make_fixture
from reference_oracle import load_reference

from tao_amodal_tpu.evaluation import AmodalDetectionEvaluator


def _add_segmentations(gt):
    """Give every gt annotation a box-polygon segmentation."""
    for ann in gt["annotations"]:
        x, y, w, h = ann["bbox"]
        ann["segmentation"] = [[x, y, x, y + h, x + w, y + h, x + w, y]]
    return gt


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("segm")
    gt, preds = make_fixture(seed=6, num_videos=2, frames_per_video=8)
    gt = _add_segmentations(gt)
    gt_path = tmp / "gt.json"
    pred_path = tmp / "preds.json"
    gt_path.write_text(json.dumps(gt))
    pred_path.write_text(json.dumps(preds))
    return str(gt_path), str(pred_path)


def test_segm_detection_parity(fixture_files):
    gt_path, pred_path = fixture_files
    _, ref_lvis = load_reference()

    ref_eval = ref_lvis.LVISEval(gt_path, pred_path, "segm")
    ref_eval.run()
    ours = AmodalDetectionEvaluator(gt_path, pred_path, "segm")
    ours.run()

    r, o = ref_eval.get_results(), ours.get_results()
    assert list(r.keys()) == list(o.keys())
    for key in r:
        assert np.isclose(r[key], o[key], atol=1e-9), (key, r[key],
                                                       o[key])
    assert o["AP"] > 0  # box-polygons of noisy boxes do overlap
