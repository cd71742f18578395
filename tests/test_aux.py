"""Aux subsystem tests: SOT benchmarks, config tree, converters,
remote stubs, fs utils."""

import json

import numpy as np
import pytest

from tao_amodal_tpu.config import Config, env_settings
from tao_amodal_tpu.data.converters import (
    burst_to_trackeval,
    imagenetvid_to_coco,
    via_to_coco,
)
from tao_amodal_tpu.evaluation.sot_benchmarks import (
    F1Benchmark,
    OPEBenchmark,
    calculate_accuracy,
    calculate_eao,
    calculate_failures,
    overlap_ratio,
    success_error,
    success_overlap,
)
from tao_amodal_tpu.utils.fs import parse_bool, simple_table


def test_overlap_ratio():
    a = [[0, 0, 10, 10], [0, 0, 10, 10]]
    b = [[0, 0, 10, 10], [5, 0, 10, 10]]
    got = overlap_ratio(a, b)
    np.testing.assert_allclose(got, [1.0, 50 / 150])


def test_success_curves():
    gt = np.array([[0, 0, 10, 10]] * 4)
    pred = np.array([[0, 0, 10, 10], [1, 1, 10, 10],
                     [8, 8, 10, 10], [50, 50, 10, 10]])
    s = success_overlap(gt, pred)
    assert s[0] == 1.0 or s[0] == 0.75  # overlap>0 for 3-4 frames
    assert s[-1] <= 0.25  # only the exact match survives thr=1.0
    p = success_error(np.zeros((4, 2)), np.zeros((4, 2)),
                      np.arange(3))
    assert (p == 1.0).all()


def test_ope_benchmark():
    gt = np.array([[0, 0, 10, 10]] * 5)
    dataset = {
        "seq1": {"gt_traj": gt,
                 "pred_trajs": {"good": gt.copy(),
                                "bad": gt + [30, 30, 0, 0]}},
    }
    bench = OPEBenchmark(dataset)
    success = bench.eval_success(["good", "bad"])
    assert success["good"]["seq1"].mean() > success["bad"]["seq1"].mean()
    text = bench.show_result(success,
                             bench.eval_precision(["good", "bad"]))
    assert "good" in text and "success" in text


def test_vot_statistics():
    pred = [[1.0], [0, 0, 10, 10], [2.0], [1.0], [0, 0, 10, 10]]
    gt = [[0, 0, 10, 10]] * 5
    n_fail, idxs = calculate_failures(pred)
    assert n_fail == 1 and idxs == [2]
    acc, n = calculate_accuracy(pred, gt, burnin=0)
    assert acc == 1.0 and n == 2
    eao = calculate_eao([[1.0, 1.0, 0.0], [0.5, 0.5, 0.5]],
                        [3, 3], low=1, high=3)
    assert 0 < eao < 1


def test_f1_benchmark():
    gt = np.array([[0, 0, 10, 10]] * 4)
    dataset = {
        "seq": {
            "gt_traj": gt,
            "pred_trajs": {"t": gt.copy()},
            "pred_scores": {"t": np.array([0.9, 0.8, 0.7, 0.95])},
        }
    }
    out = F1Benchmark(dataset).eval("t")
    assert out["f1"] > 0.99


def test_config_merge(tmp_path):
    cfg = Config()
    yaml_path = tmp_path / "exp.yaml"
    yaml_path.write_text(
        "track:\n  penalty_k: 0.1\ntrain:\n  epochs: 3\n")
    cfg.merge_from_file(str(yaml_path))
    assert cfg.track.penalty_k == 0.1
    assert cfg.train.epochs == 3
    cfg.merge_from_list(["sort.max_age", 5])
    assert cfg.sort.max_age == 5
    with pytest.raises(KeyError):
        cfg.merge_from_dict({"nope": 1})
    assert env_settings().checkpoint_dir


def test_imagenetvid_converter(tmp_path):
    xml = """<annotation><filename>000000</filename>
      <size><width>640</width><height>480</height></size>
      <object><name>n02084071</name><trackid>0</trackid>
        <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>110</xmax>
        <ymax>170</ymax></bndbox></object></annotation>"""
    (tmp_path / "000000.xml").write_text(xml)
    coco = imagenetvid_to_coco(str(tmp_path))
    assert len(coco["images"]) == 1
    ann = coco["annotations"][0]
    assert ann["bbox"] == [10.0, 20.0, 100.0, 150.0]
    assert coco["categories"][0]["name"] == "n02084071"


def test_via_converter():
    via = {"_via_img_metadata": {
        "img1.jpg123": {
            "filename": "img1.jpg",
            "regions": [{"shape_attributes": {
                "name": "rect", "x": 5, "y": 6, "width": 20,
                "height": 30}, "region_attributes": {"type": "car"}}],
        }}}
    coco = via_to_coco(via)
    assert coco["annotations"][0]["bbox"] == [5, 6, 20, 30]
    assert coco["annotations"][0]["attributes"]["type"] == "car"


def test_burst_trackeval_bridge(tmp_path):
    burst = {"sequences": [
        {"dataset": "LaSOT", "seq_name": "cat-1", "segmentations": []},
        {"dataset": "BDD", "seq_name": "b0", "segmentations": []},
    ]}
    out = burst_to_trackeval(burst, str(tmp_path / "te"))
    assert out["num_sequences"] == 2
    assert (tmp_path / "te" / "run_trackeval.sh").exists()
    assert (tmp_path / "te" / "gt" / "val" / "LaSOT_cat-1" /
            "gt.json").exists()


def test_fs_utils():
    assert parse_bool("Yes") and not parse_bool("0")
    table = simple_table([("alpha", 1), ("b", 2)])
    assert "alpha" in table and "2" in table


def test_remote_stubs(tmp_path):
    from tao_amodal_tpu.data.remote import CachedStore, retry_with_backoff

    calls = {"n": 0}

    @retry_with_backoff(attempts=3, base_delay=0.0)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert flaky() == "ok" and calls["n"] == 3

    store = CachedStore(str(tmp_path / "cache"),
                        fetcher=lambda key: b"DATA")
    p = store.get("some/key")
    assert open(p, "rb").read() == b"DATA"
    # Second get hits the cache (no fetcher crash even if broken).
    store.fetcher = None
    assert store.get("some/key") == p


def test_lvis_vis_renders(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import sys

    sys.path.insert(0, "tests")
    from fixture_gen import make_fixture

    from tao_amodal_tpu.data.lvis import LvisDataset
    from tao_amodal_tpu.evaluation.lvis_vis import LvisVis

    gt, _ = make_fixture(seed=2, num_videos=1, frames_per_video=4)
    path = tmp_path / "gt.json"
    path.write_text(json.dumps(gt))
    vis = LvisVis(LvisDataset(str(path)))
    img_id = gt["annotations"][0]["image_id"]
    ax = vis.vis_img(img_id, show_segms=False)
    assert len(ax.patches) > 0
