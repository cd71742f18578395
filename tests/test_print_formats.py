"""Byte-level output-format parity for the evaluators' result
printers (the reference's greppable surfaces)."""

import copy
import json
import logging

import pytest

from fixture_gen import make_fixture
from reference_oracle import load_reference

from tao_amodal_tpu.data.results import make_track_ids_unique
from tao_amodal_tpu.evaluation import (
    AmodalDetectionEvaluator,
    TrackMapEvaluator,
)


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.lines = []

    def emit(self, record):
        self.lines.append(record.getMessage())


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fmt")
    gt, preds = make_fixture(seed=2, num_videos=3, frames_per_video=10)
    make_track_ids_unique(preds)
    (tmp / "gt.json").write_text(json.dumps(gt))
    (tmp / "preds.json").write_text(json.dumps(preds))
    return str(tmp / "gt.json"), str(tmp / "preds.json")


def _capture_track_print(evaluator):
    cap = _Capture()
    evaluator.logger.addHandler(cap)
    evaluator.logger.setLevel(logging.INFO)
    evaluator.print_results()
    evaluator.logger.removeHandler(cap)
    return cap.lines


def test_track_print_results_byte_parity(fixture_files):
    gt_path, pred_path = fixture_files
    ref_tao, _ = load_reference()

    ref = ref_tao.TaoEval(ref_tao.Tao(gt_path),
                          json.load(open(pred_path)))
    ref.run()
    ours = TrackMapEvaluator(gt_path, pred_path)
    ours.run()

    assert _capture_track_print(ours) == _capture_track_print(ref)


def test_detection_print_results_byte_parity(fixture_files, capsys):
    gt_path, pred_path = fixture_files
    _, ref_lvis = load_reference()

    ref = ref_lvis.LVISEval(gt_path, pred_path, "bbox")
    ref.run()
    ref.print_results()
    ref_out = capsys.readouterr().out

    ours = AmodalDetectionEvaluator(gt_path, pred_path, "bbox")
    ours.run()
    ours.print_results()
    our_out = capsys.readouterr().out

    assert our_out == ref_out
