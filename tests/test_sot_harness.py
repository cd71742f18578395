"""SOT harness tests: dataset runner, VOT restart protocol, OPE glue."""

import os

import numpy as np
import pytest
from PIL import Image

from tao_amodal_tpu.cli.sot_cli import (
    evaluate,
    run_dataset,
    run_vot_protocol,
)
from tao_amodal_tpu.data.sot_datasets import SotDataset, SotSequence


class TeleportTracker:
    """Fake tracker: reports the gt box (fed at construction) with
    occasional total misses to exercise the failure path."""

    def __init__(self, gt, miss_frames=()):
        self.gt = gt
        self.miss = set(miss_frames)
        self.f = 0

    def init(self, image, box):
        # VOT protocol may re-init mid-sequence; track global frame.
        self.f += 1

    def update(self, image):
        f = self.f
        self.f += 1
        if f in self.miss:
            return np.array([0.0, 0.0, 1.0, 1.0]), 0.1
        return np.asarray(self.gt[min(f, len(self.gt) - 1)]), 0.9

    def track(self, frames, init_box):
        boxes, scores, times = [], [], []
        for i, _ in enumerate(frames):
            if i == 0:
                self.init(None, init_box)
                boxes.append(np.asarray(init_box, float))
                scores.append(1.0)
            else:
                b, s = self.update(None)
                boxes.append(b)
                scores.append(s)
            times.append(0.001)
        return (np.stack(boxes), np.asarray(scores),
                np.asarray(times))


@pytest.fixture()
def tiny_dataset(tmp_path):
    frames = []
    for i in range(8):
        p = tmp_path / f"{i:03d}.jpg"
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(p)
        frames.append(str(p))
    gt = np.tile([4.0, 4.0, 10.0, 10.0], (8, 1))
    return SotDataset([SotSequence("seq0", frames, gt)])


def test_run_dataset_and_evaluate(tiny_dataset, tmp_path):
    seq = tiny_dataset["seq0"]
    tracker = TeleportTracker(seq.gt_boxes)
    rd = str(tmp_path / "results")
    stats = run_dataset(tracker, tiny_dataset, rd, "fake")
    assert stats["mean_fps"] > 0
    assert os.path.exists(os.path.join(rd, "fake", "seq0.txt"))
    aucs = evaluate(tiny_dataset, rd, ["fake"])
    assert aucs["fake"] > 0.9  # perfect tracking


def test_vot_restart_protocol(tiny_dataset, tmp_path):
    seq = tiny_dataset["seq0"]
    tracker = TeleportTracker(seq.gt_boxes, miss_frames={3})
    out = run_vot_protocol(tracker, tiny_dataset,
                           str(tmp_path / "vot"), "fake", burnin=0,
                           skip_after_failure=2)
    assert out["seq0"]["failures"] == 1
    assert out["seq0"]["accuracy"] > 0.9
    path = tmp_path / "vot" / "fake" / "baseline" / "seq0_001.txt"
    lines = path.read_text().strip().splitlines()
    assert lines[0] == "1.0000"            # init marker
    assert any(ln == "2.0000" for ln in lines)  # failure marker


def test_evaluate_vot_full_protocol(tiny_dataset, tmp_path):
    """run_vot_protocol -> evaluate_vot: fragment EAO + radar plot
    from written trajectories (the reference eval.py VOT surface)."""
    from tao_amodal_tpu.cli.sot_cli import evaluate_vot

    seq = tiny_dataset["seq0"]
    tracker = TeleportTracker(seq.gt_boxes, miss_frames={3})
    rd = str(tmp_path / "vot")
    run_vot_protocol(tracker, tiny_dataset, rd, "fake", burnin=0,
                     skip_after_failure=2)
    result = evaluate_vot(tiny_dataset, rd, ["fake"], plots=True)
    assert "fake" in result and "all" in result["fake"]
    assert 0.0 <= result["fake"]["all"] <= 1.0
    assert os.path.exists(os.path.join(rd, "eao.png"))
