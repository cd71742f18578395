"""tools/run_video.py — headless video demo runner (reference
``pytracking/run_video.py`` / pysot ``tools/demo.py`` equivalent)."""

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", "tools"))


def _write_seq(dirname, T=6, H=96, W=128, size=24, step=4):
    os.makedirs(dirname, exist_ok=True)
    boxes = []
    for t in range(T):
        img = np.full((H, W, 3), 30, np.uint8)
        x, y = 20 + step * t, 30 + (step // 2) * t
        img[y:y + size, x:x + size] = [230, 80, 80]
        Image.fromarray(img).save(os.path.join(dirname, f"{t:04d}.jpg"))
        boxes.append([x, y, size, size])
    return boxes


def test_run_video_on_frame_dir(tmp_path):
    import run_video

    src = str(tmp_path / "frames")
    out = str(tmp_path / "tracked")
    boxes_out = str(tmp_path / "boxes.txt")
    gt = _write_seq(src)
    rc = run_video.main([
        "eco", src, "--init_box",
        ",".join(str(v) for v in gt[0]),
        "--output", out, "--boxes_out", boxes_out,
    ])
    assert rc == 0
    frames = sorted(os.listdir(out))
    assert len(frames) == 6
    lines = open(boxes_out).read().strip().splitlines()
    assert len(lines) == 6
    parsed = np.array([[float(v) for v in ln.split(",")]
                       for ln in lines])
    assert parsed.shape == (6, 5)
    # Boxes stay finite, positive-sized, inside the frame.
    assert np.isfinite(parsed).all()
    assert (parsed[:, 2] > 0).all() and (parsed[:, 3] > 0).all()
    # First frame echoes the init box.
    np.testing.assert_allclose(parsed[0, :4], gt[0], atol=1e-6)


def test_iter_frames_rejects_empty_dir(tmp_path):
    import pytest
    import run_video

    with pytest.raises(ValueError):
        list(run_video.iter_frames(str(tmp_path)))
