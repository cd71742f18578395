"""Device (float32, batched) Track-mAP vs the float64 host evaluator."""

import json

import numpy as np
import pytest

from fixture_gen import make_fixture

from tao_amodal_tpu.data.results import make_track_ids_unique
from tao_amodal_tpu.evaluation.device_eval import DeviceTrackEval
from tao_amodal_tpu.evaluation.track_eval import TrackMapEvaluator


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fixture_dev")
    gt, preds = make_fixture(seed=4, num_videos=4, frames_per_video=16)
    make_track_ids_unique(preds)
    gt_path = tmp / "gt.json"
    pred_path = tmp / "preds.json"
    gt_path.write_text(json.dumps(gt))
    pred_path.write_text(json.dumps(preds))
    return str(gt_path), str(pred_path)


def test_device_eval_matches_host(fixture_files):
    gt_path, pred_path = fixture_files

    host = TrackMapEvaluator(gt_path, pred_path)
    host.run()
    dev = DeviceTrackEval(gt_path, pred_path)
    dev.run()

    h = host.get_results()
    d = dev.get_results()
    assert list(h.keys()) == list(d.keys())
    for key in h:
        # float32 IoU on device can flip exact-tie matches; allow a
        # tiny metric tolerance.
        assert abs(h[key] - d[key]) < 2e-3, (key, h[key], d[key])
    # Headline metrics are meaningful (nonzero) on this fixture.
    assert h["AP50"] > 0.05


def test_device_detection_eval_matches_host(fixture_files):
    from tao_amodal_tpu.evaluation.detection_eval import (
        AmodalDetectionEvaluator,
    )
    from tao_amodal_tpu.evaluation.device_detection import (
        DeviceDetectionEval,
    )

    gt_path, pred_path = fixture_files
    host = AmodalDetectionEvaluator(gt_path, pred_path, "bbox")
    host.run()
    dev = DeviceDetectionEval(gt_path, pred_path, "bbox")
    dev.run()

    h, d = host.get_results(), dev.get_results()
    assert list(h.keys()) == list(d.keys())
    for key in h:
        assert abs(h[key] - d[key]) < 2e-3, (key, h[key], d[key])


def test_device_eval_context_parallel_mesh(fixture_files):
    """Frame-sharded (context-parallel) IoU path on the 8-device mesh
    gives the same metrics."""
    from tao_amodal_tpu.parallel.mesh import make_mesh

    gt_path, pred_path = fixture_files
    host = TrackMapEvaluator(gt_path, pred_path)
    host.run()
    dev = DeviceTrackEval(gt_path, pred_path,
                          mesh=make_mesh(data=8, model=1),
                          cp_min_frames=8)
    dev.run()
    h, d = host.get_results(), dev.get_results()
    for key in h:
        assert abs(h[key] - d[key]) < 2e-3, (key, h[key], d[key])


def test_device_detection_eval_chunked_matches_unchunked(fixture_files):
    """Forcing tiny HBM chunk budgets must not change any metric
    (bucket chunking is a pure batching decision)."""
    from tao_amodal_tpu.evaluation.device_detection import (
        DeviceDetectionEval,
    )

    gt_path, pred_path = fixture_files
    base = DeviceDetectionEval(gt_path, pred_path, "bbox")
    base.run()
    chunked = DeviceDetectionEval(gt_path, pred_path, "bbox")
    chunked.chunk_budget_bytes = 1   # every bucket splits
    chunked.min_chunk = 2
    chunked.run()
    b, c = base.get_results(), chunked.get_results()
    for key in b:
        assert abs(b[key] - c[key]) < 1e-12, (key, b[key], c[key])


def _triangle_segmentations(gt):
    for ann in gt["annotations"]:
        x, y, w, h = ann["bbox"]
        ann["segmentation"] = [[x, y, x, y + h, x + w, y + h]]
    return gt


@pytest.fixture(scope="module")
def segm_fixture_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fixture_dev_segm")
    gt, preds = make_fixture(seed=11, num_videos=2, frames_per_video=8,
                             num_cats=4, tracks_per_video=4)
    _triangle_segmentations(gt)
    make_track_ids_unique(preds)
    gt_path, pred_path = tmp / "gt.json", tmp / "preds.json"
    gt_path.write_text(json.dumps(gt))
    pred_path.write_text(json.dumps(preds))
    return str(gt_path), str(pred_path)


def test_device_segm_track_eval_matches_host(segm_fixture_files):
    """segm track mAP: mask runs on host (RLE codec), matching cells on
    device — must agree with the all-host float64 evaluator."""
    gt_path, pred_path = segm_fixture_files
    host = TrackMapEvaluator(gt_path, pred_path, iou_type="segm")
    host.run()
    dev = DeviceTrackEval(gt_path, pred_path, iou_type="segm")
    dev.run()
    h, d = host.get_results(), dev.get_results()
    assert list(h.keys()) == list(d.keys())
    for key in h:
        assert abs(h[key] - d[key]) < 2e-3, (key, h[key], d[key])
    # The segm numbers must differ from bbox (masks actually flowed).
    bbox = DeviceTrackEval(gt_path, pred_path, iou_type="bbox")
    bbox.run()
    b = bbox.get_results()
    assert any(not np.isclose(d[k], b[k]) for k in d)


def test_device_segm_detection_eval_matches_host(segm_fixture_files):
    from tao_amodal_tpu.evaluation.detection_eval import (
        AmodalDetectionEvaluator,
    )
    from tao_amodal_tpu.evaluation.device_detection import (
        DeviceDetectionEval,
    )

    gt_path, pred_path = segm_fixture_files
    host = AmodalDetectionEvaluator(gt_path, pred_path, "segm")
    host.run()
    dev = DeviceDetectionEval(gt_path, pred_path, "segm")
    dev.run()
    h, d = host.get_results(), dev.get_results()
    assert list(h.keys()) == list(d.keys())
    for key in h:
        assert abs(h[key] - d[key]) < 2e-3, (key, h[key], d[key])
