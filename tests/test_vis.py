"""Visualization pipeline tests (canvas geometry, overlays, video CLI)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

from fixture_gen import make_fixture

from tao_amodal_tpu.utils import vis as vis_utils
from tao_amodal_tpu.utils.interpolation import interpolate_annotations

REPO = Path(__file__).resolve().parent.parent


def test_padded_canvas_geometry():
    img = np.zeros((100, 200, 3), np.uint8)
    canvas, (ox, oy) = vis_utils.make_padded_canvas(img, scale=1.5)
    # Reference geometry (vis_amodal_mask_videos.py:147-153): 1.5x
    # canvas, image centered.
    assert canvas.shape == (150, 300, 3)
    assert (ox, oy) == (50, 25)
    assert (canvas[oy:oy + 100, ox:ox + 200] == 0).all()
    assert (canvas[0, 0] == 255).all()


def test_overlay_amodal_box_offset():
    img = np.zeros((50, 50, 3), np.uint8)
    canvas, origin = vis_utils.make_padded_canvas(img, scale=2.0)
    anns = [{"bbox": [-10, -10, 20, 20], "track_id": 3,
             "category_id": 1}]
    out = vis_utils.overlay_amodal_boxes(canvas.copy(), anns, origin,
                                         show_class=False)
    # The out-of-frame box lands inside the canvas (offset by origin).
    assert (out != canvas).any()


def test_mask_overlay_changes_pixels():
    img = np.zeros((40, 40, 3), np.uint8)
    canvas, origin = vis_utils.make_padded_canvas(img, scale=1.5)
    mask = np.zeros((40, 40), np.uint8)
    mask[10:20, 10:20] = 1
    out = vis_utils.overlay_masks(canvas.copy(), {1: mask}, origin)
    ox, oy = origin
    assert (out[oy + 12, ox + 12] != canvas[oy + 12, ox + 12]).any()


def test_interpolation_fills_gaps():
    images = {i: {"id": i, "video_id": 1, "frame_index": i - 1}
              for i in range(1, 6)}
    anns = [
        {"id": 1, "track_id": 7, "category_id": 2, "image_id": 1,
         "bbox": [0.0, 0.0, 10.0, 10.0], "area": 100.0},
        {"id": 2, "track_id": 7, "category_id": 2, "image_id": 5,
         "bbox": [40.0, 0.0, 10.0, 10.0], "area": 100.0},
    ]
    out = interpolate_annotations(anns, images)
    interp = [a for a in out if a.get("interpolated")]
    assert len(interp) == 3
    mid = [a for a in interp if a["image_id"] == 3][0]
    np.testing.assert_allclose(mid["bbox"], [20, 0, 10, 10])


def test_vis_cli_end_to_end(tmp_path):
    gt, preds = make_fixture(seed=5, num_videos=2, frames_per_video=6)
    gt_path = tmp_path / "gt.json"
    pred_path = tmp_path / "preds.json"
    out_dir = tmp_path / "out"
    gt_path.write_text(json.dumps(gt))
    pred_path.write_text(json.dumps(preds))

    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "vis_prediction.py"),
         "--annotation", str(gt_path), "--prediction", str(pred_path),
         "--output_dir", str(out_dir), "--video_name", "video_1",
         "--score_threshold", "0.1", "--fps", "5"],
        capture_output=True, text=True, cwd=str(REPO), timeout=300)
    assert proc.returncode == 0, proc.stderr
    outputs = list(out_dir.glob("*"))
    assert outputs, "no video output written"
