"""Golden-file parity: our evaluators vs stored reference-oracle
metrics (survives even if the reference import environment changes)."""

import json
import os

import numpy as np

from fixture_gen import make_fixture

from tao_amodal_tpu.data.results import make_track_ids_unique
from tao_amodal_tpu.evaluation import (
    AmodalDetectionEvaluator,
    TrackMapEvaluator,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                      "golden_seed0.json")


def test_golden_metrics(tmp_path):
    with open(GOLDEN) as f:
        golden = json.load(f)
    gt, preds = make_fixture(seed=golden["seed"])
    make_track_ids_unique(preds)
    gt_path = tmp_path / "gt.json"
    pred_path = tmp_path / "preds.json"
    gt_path.write_text(json.dumps(gt))
    pred_path.write_text(json.dumps(preds))

    track = TrackMapEvaluator(str(gt_path), str(pred_path))
    track.run()
    got_track = {str(k): float(v) for k, v in
                 track.get_results().items()}
    assert got_track.keys() == golden["track"].keys()
    for k, v in golden["track"].items():
        assert np.isclose(got_track[k], v, atol=1e-9), (k, got_track[k],
                                                        v)

    det = AmodalDetectionEvaluator(str(gt_path), str(pred_path), "bbox")
    det.run()
    got_det = {str(k): float(v) for k, v in det.get_results().items()}
    assert got_det.keys() == golden["detection"].keys()
    for k, v in golden["detection"].items():
        assert np.isclose(got_det[k], v, atol=1e-9), (k, got_det[k], v)
