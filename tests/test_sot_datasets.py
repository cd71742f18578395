"""Layout tests for every SOT benchmark loader (8 reference layouts).

Reference layout contracts: pysot ``toolkit/datasets/*`` and
pytracking ``pytracking/evaluation/{otb,vot,lasot,got10k,trackingnet,
nfs,uav,tpl}dataset.py``.
"""

import os

import numpy as np
import pytest
from PIL import Image

from tao_amodal_tpu.data.sot_datasets import load_sot_dataset


def _write_frames(d, n, pattern="{:05d}.jpg"):
    os.makedirs(d, exist_ok=True)
    for i in range(1, n + 1):
        Image.new("RGB", (8, 6)).save(os.path.join(d, pattern.format(i)))


def _gt_rows(n, rs):
    g = rs.rand(n, 4) * 20 + 1
    return g


def test_nfs_layout(tmp_path):
    rs = np.random.RandomState(0)
    root = tmp_path / "nfs"
    (root / "anno").mkdir(parents=True)
    for seq, n in [("Gymnastics", 4), ("bee", 3)]:
        _write_frames(str(root / "sequences" / seq), n)
        np.savetxt(str(root / "anno" / f"nfs_{seq}.txt"),
                   _gt_rows(n, rs))
    ds = load_sot_dataset("nfs", str(root))
    assert ds.names() == ["nfs_Gymnastics", "nfs_bee"]
    seq = ds["nfs_bee"]
    assert len(seq.frames) == 3 and seq.gt_boxes.shape == (3, 4)
    assert seq.init_box is not None


def test_nfs_raw_240fps_anno(tmp_path):
    """Raw NFS anno rows are ``id x0 y0 x1 y1 ...`` -> xywh."""
    root = tmp_path / "nfs"
    _write_frames(str(root / "sequences" / "jet"), 2)
    (root / "anno").mkdir()
    rows = np.array([[1, 10, 20, 30, 50, 0, 0],
                     [2, 11, 21, 31, 51, 0, 0]], float)
    np.savetxt(str(root / "anno" / "nfs_jet.txt"), rows)
    seq = load_sot_dataset("nfs", str(root))["nfs_jet"]
    np.testing.assert_allclose(seq.gt_boxes[0], [10, 20, 20, 30])


def test_uav123_layout_and_subsequences(tmp_path):
    rs = np.random.RandomState(1)
    root = tmp_path / "uav"
    (root / "anno" / "UAV123").mkdir(parents=True)
    _write_frames(str(root / "data_seq" / "UAV123" / "bike1"), 5,
                  "{:06d}.jpg")
    np.savetxt(str(root / "anno" / "UAV123" / "bike1.txt"),
               _gt_rows(5, rs), delimiter=",")
    # Sub-sequence sharing bird1's frame dir.
    _write_frames(str(root / "data_seq" / "UAV123" / "bird1"), 4,
                  "{:06d}.jpg")
    np.savetxt(str(root / "anno" / "UAV123" / "bird1_2.txt"),
               _gt_rows(3, rs), delimiter=",")
    ds = load_sot_dataset("uav123", str(root))
    assert ds.names() == ["uav_bike1", "uav_bird1_2"]
    assert len(ds["uav_bike1"]) == 5
    # Sub-sequence truncates to the annotation length.
    assert len(ds["uav_bird1_2"]) == 3


def test_tpl_layout_and_exclude_otb(tmp_path):
    rs = np.random.RandomState(2)
    root = tmp_path / "tpl"
    for seq, n in [("Skating2", 3), ("Pool_ce3", 4)]:
        d = root / f"tpl_{seq}"
        _write_frames(str(d / "img"), n, "{:04d}.jpg")
        np.savetxt(str(d / f"{seq}_gt.txt"), _gt_rows(n, rs),
                   delimiter=",")
    ds = load_sot_dataset("tpl", str(root))
    assert ds.names() == ["tpl_Pool_ce3", "tpl_Skating2"]
    # TPLDatasetNoOtb equivalent: only the _ce sequences remain.
    ds2 = load_sot_dataset("tpl", str(root), exclude_otb=True)
    assert ds2.names() == ["tpl_Pool_ce3"]


def test_all_eight_benchmarks_registered():
    from tao_amodal_tpu.data.sot_datasets import LOADERS

    assert set(LOADERS) == {"otb", "vot", "lasot", "got10k",
                            "trackingnet", "nfs", "uav123", "tpl"}


def test_missing_roots_degrade_to_empty(tmp_path):
    for name in ("nfs", "uav123", "tpl"):
        ds = load_sot_dataset(name, str(tmp_path / "nope"))
        assert len(ds) == 0
