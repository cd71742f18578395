"""Vmapped hyperparameter sweep: one program per sequence, whole grid.

Correctness contract: row i of the sweep must equal a plain
SiamRPN run whose config bakes grid cell i (the reference's
one-job-per-cell sweep, ``pysot/tools/hp_search.py``, collapsed into a
batch axis)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tao_amodal_tpu.trackers.factory import build_tracker
from tao_amodal_tpu.trackers.siamrpn import (
    SiamConfig,
    SiamRPNTracker,
    make_siamrpn_hp_sweep,
    track_clip,
)


@pytest.fixture(scope="module")
def tiny_tracker():
    return build_tracker("siamrpn", seed=0)


def _frames(T=5, H=96, W=96, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (H, W, 3), np.uint8).astype(np.float32)
    out = []
    for t in range(T):
        img = np.roll(base, shift=2 * t, axis=1)
        out.append(img)
    return jnp.asarray(np.stack(out))


def test_sweep_rows_match_baked_configs(tiny_tracker):
    frames = _frames()
    init_box = np.asarray([30.0, 30.0, 20.0, 20.0], np.float32)
    grid = np.asarray([[0.02, 0.30, 0.25],
                       [0.04, 0.44, 0.40],
                       [0.16, 0.60, 0.55]], np.float32)

    sweep = make_siamrpn_hp_sweep(tiny_tracker.model,
                                  tiny_tracker.params,
                                  tiny_tracker.cfg)
    boxes, scores = sweep(frames, init_box, jnp.asarray(grid))
    assert boxes.shape == (3, 5, 4) and scores.shape == (3, 5)

    for i, (pk, wi, lr) in enumerate(grid):
        cfg = tiny_tracker.cfg._replace(penalty_k=float(pk),
                                        window_influence=float(wi),
                                        lr=float(lr))
        single = SiamRPNTracker(tiny_tracker.model,
                                tiny_tracker.params, cfg)
        ref_boxes, ref_scores = track_clip(single.init_fn,
                                           single.step_fn, frames,
                                           init_box)
        np.testing.assert_allclose(np.asarray(boxes[i]),
                                   np.asarray(ref_boxes),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(scores[i]),
                                   np.asarray(ref_scores),
                                   rtol=1e-4, atol=1e-4)


def test_hp_search_cli(tmp_path):
    # Tiny OTB-layout dataset.
    for name in ("s0", "s1"):
        d = tmp_path / name / "img"
        d.mkdir(parents=True)
        rng = np.random.RandomState(1)
        base = rng.randint(0, 255, (64, 64, 3), np.uint8)
        gt = []
        for t in range(4):
            Image.fromarray(np.roll(base, t, axis=1)).save(
                d / f"{t:03d}.jpg")
            gt.append([20.0 + t, 20.0, 16.0, 16.0])
        np.savetxt(str(tmp_path / name / "groundtruth_rect.txt"),
                   np.asarray(gt), delimiter=",", fmt="%.1f")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "hp_search_tool", os.path.join(
            os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tools", "hp_search.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "hp.json")
    res = mod.main(["--dataset", "otb", "--dataset_root",
                    str(tmp_path), "--penalty_k", "0.04,0.08",
                    "--window_influence", "0.44", "--lr", "0.4",
                    "--output", out])
    assert len(res["best"]) == 3 and np.isfinite(res["auc"])
    assert os.path.exists(out)
