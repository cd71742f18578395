"""Closed-loop test: pipeline inference CLI -> prediction JSON ->
evaluation CLI, all on tiny configs."""

import json

import pytest

from fixture_gen import make_fixture


@pytest.fixture()
def tiny_pipeline(monkeypatch):
    import tao_amodal_tpu.pipeline as pl

    orig = pl.AmodalPipeline.create

    def tiny_create(num_classes=80, **kw):
        return orig(num_classes=num_classes, num_dets=8,
                    num_proposals=16, backbone_stages=(1, 1, 1, 1))

    monkeypatch.setattr(pl.AmodalPipeline, "create",
                        staticmethod(tiny_create))


def test_infer_then_eval(tmp_path, tiny_pipeline):
    from tao_amodal_tpu.cli.eval_cli import main as eval_main
    from tao_amodal_tpu.cli.infer_cli import main as infer_main

    gt, _ = make_fixture(seed=11, num_videos=1, frames_per_video=4,
                         img_size=(128, 128))
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    pred_path = tmp_path / "preds.json"

    records = infer_main([
        "--annotation", str(gt_path), "--output", str(pred_path),
        "--input_size", "128", "--clip_len", "4",
        "--score_threshold", "0.0"])
    assert records
    cats = {r["category_id"] for r in records}
    gt_cats = {c["id"] for c in gt["categories"]}
    assert cats <= gt_cats  # class index -> dataset category mapping

    det, trk = eval_main([
        "--track_result", str(pred_path),
        "--output_log", str(tmp_path / "eval.log"),
        "--annotation", str(gt_path)])
    # Random weights -> ~0 AP, but the whole loop must run and emit
    # the metric schema.
    assert "TAO 3DmAP" in trk
    assert "AP" in det
