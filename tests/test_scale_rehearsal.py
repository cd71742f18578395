"""Scale-rehearsal harness + prediction-JSON schema regression.

The rehearsal (tools/scale_rehearsal.py) is the config-5 dress run:
fixture -> run_pipeline -> lvis_instances_results.json -> eval CLI.
This test drives it at toy scale and pins the output JSON to the exact
official prediction schema (reference ``README.md:107-116``).
"""

from __future__ import annotations

import json
import os

import pytest

SCHEMA = {
    "image_id": int,
    "category_id": int,
    "bbox": list,
    "score": float,
    "track_id": int,
    "video_id": int,
}


def test_rehearsal_end_to_end_and_schema(tmp_path):
    from tools.scale_rehearsal import main

    summary = main([
        "--workdir", str(tmp_path),
        "--out", str(tmp_path / "summary.json"),
        "--videos", "2", "--frames", "6", "--hw", "128",
        "--tracks", "3", "--input_size", "128",
        "--backbone_stages", "1,1,1,1",
        "--num_dets", "8", "--num_proposals", "16",
        "--score_threshold", "0.0",
    ])
    assert summary["num_predictions"] > 0
    assert summary["infer_seconds"] > 0
    assert "track_map" in summary and "det_ap" in summary

    pred = os.path.join(str(tmp_path), "TAO-Amodal",
                        "lvis_instances_results.json")
    records = json.load(open(pred))
    assert records
    gt = json.load(open(os.path.join(
        str(tmp_path), "TAO-Amodal", "amodal_annotations",
        "validation_lvis_v1.json")))
    img_ids = {im["id"] for im in gt["images"]}
    cat_ids = {c["id"] for c in gt["categories"]}
    vid_ids = {v["id"] for v in gt["videos"]}
    track_vid = {}
    for r in records:
        assert set(r.keys()) == set(SCHEMA.keys()), r.keys()
        for k, t in SCHEMA.items():
            assert isinstance(r[k], t), (k, type(r[k]))
        assert len(r["bbox"]) == 4  # [x, y, w, h]
        assert r["bbox"][2] >= 0 and r["bbox"][3] >= 0
        assert r["image_id"] in img_ids
        assert r["category_id"] in cat_ids
        assert r["video_id"] in vid_ids
        # One video per track id (the results loader asserts this,
        # reference results.py:111) and one category per track
        # (tao.py:148-149) -- video_detections_to_json's contract.
        key = r["track_id"]
        prev = track_vid.setdefault(key, (r["video_id"],
                                          r["category_id"]))
        assert prev == (r["video_id"], r["category_id"])
