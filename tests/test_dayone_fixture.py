"""E2E over the official-layout fixture (VERDICT r3 item 7).

``tools/make_dayone_fixture.py`` builds the exact TAO-Amodal directory
tree (reference ``README.md:66-85``); this proves the day-one command
path — annotation + example prediction -> eval CLI -> copypaste lines —
plus the BURST mask file, without any downloads.
"""

import json
import os

import numpy as np


def _build(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from make_dayone_fixture import build

    return build(str(tmp_path), num_videos=3, frames_per_video=8,
                 hw=96, tracks_per_video=3, seed=7)


def test_dayone_tree_and_eval_cli(tmp_path, capsys):
    root = _build(tmp_path)
    # Official tree shape.
    for sub in ("frames/train", "amodal_annotations",
                "example_output", "BURST_annotations/train"):
        assert os.path.isdir(os.path.join(root, sub)), sub

    gt_path = os.path.join(root, "amodal_annotations",
                           "validation_lvis_v1.json")
    pred_path = os.path.join(root, "example_output", "prediction.json")

    # Prediction schema: exactly the 6 official keys (README:107-116).
    preds = json.load(open(pred_path))
    assert preds and all(
        set(p) == {"image_id", "category_id", "bbox", "score",
                   "track_id", "video_id"} for p in preds)

    # Every annotation's frame exists on disk under frames/.
    gt = json.load(open(gt_path))
    for im in gt["images"][:8]:
        assert os.path.exists(os.path.join(root, "frames",
                                           im["file_name"]))

    # The eval CLI runs on the stand-in exactly as the README documents.
    from tao_amodal_tpu.cli.eval_cli import main

    log = str(tmp_path / "eval.log")
    main(["--track_result", pred_path, "--output_log", log,
          "--annotation", gt_path])
    text = open(log).read()
    assert text.count("copypaste:") == 4
    # Detection + track sections both produced numbers.
    assert "TAO 3DmAP" in text


def test_dayone_burst_masks_decode(tmp_path):
    root = _build(tmp_path)
    from tao_amodal_tpu.data.burst import BurstDataset

    ds = BurstDataset(os.path.join(root, "BURST_annotations", "train",
                                   "train_visibility.json"))
    assert ds.num_videos == 3
    video = ds.get_video_by_index(0)
    assert video.name.split("/")[0] in (
        "ArgoVerse", "BDD", "Charades", "HACS", "LaSOT", "YFCC100M")
    masks = video.load_masks(0)
    assert masks, "first frame should carry track masks"
    for m in masks.values():
        assert m.dtype == np.uint8 and m.any()
