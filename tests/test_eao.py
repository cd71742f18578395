"""Fragment-EAO parity vs the reference EAOBenchmark run as an oracle.

The reference fragment machinery
(``pysot/toolkit/evaluation/eao_benchmark.py:91-163``) is imported
from /root/reference with only the leaf overlap kernel shimmed (the
compiled ``region`` Cython module is absent; both sides use the same
rect-IoU leaf, so the machinery itself is what's compared).
"""

import importlib
import sys
import types

import numpy as np
import pytest

from tao_amodal_tpu.evaluation.sot_benchmarks import (
    EAOBenchmark,
    expected_overlap_curve,
    trajectory_overlaps,
)

TOOLKIT = ("/root/reference/visualization/tao/third_party/pysot/"
           "toolkit")


def _load_reference_eao():
    """Import reference eao_benchmark with a region-leaf shim."""
    from tao_amodal_tpu.evaluation.sot_benchmarks import overlap_ratio

    if "ref_tk" not in sys.modules:
        pkg = types.ModuleType("ref_tk")
        pkg.__path__ = [TOOLKIT]
        sys.modules["ref_tk"] = pkg

        region = types.ModuleType("ref_tk.utils.region")

        def vot_overlap_traj(pred, gt, bound=None):
            out = []
            for p, g in zip(pred, gt):
                if len(p) == 1:
                    out.append(np.nan)
                else:
                    out.append(float(overlap_ratio(
                        np.asarray([g], np.float64),
                        np.asarray([p], np.float64))[0]))
            return out

        region.vot_overlap_traj = vot_overlap_traj
        sys.modules["ref_tk.utils.region"] = region
    return importlib.import_module("ref_tk.evaluation.eao_benchmark")


class _RefVideo:
    def __init__(self, name, gt, runs, w, h, tags=None):
        self.name = name
        self.gt_traj = gt
        self.pred_trajs = {"tracker": runs}
        self.width, self.height = w, h
        self._tags = tags or {}

    def select_tag(self, tag, start=0, end=0):
        if tag == "all" or tag not in self._tags:
            return [1.0] * max(end - start, 0)
        return list(self._tags[tag][start:end])


class _RefDataset:
    name = "VOT2018"

    def __init__(self, videos):
        self._videos = {v.name: v for v in videos}
        self.tracker_names = ["tracker"]

    def __iter__(self):
        return iter(self._videos.values())

    def __getitem__(self, name):
        return self._videos[name]


def _synth_sequences(seed, num_seqs=6, min_len=120, max_len=420):
    """VOT-style trajectories with realistic failure/restart structure."""
    rng = np.random.RandomState(seed)
    seqs = []
    for s in range(num_seqs):
        T = int(rng.randint(min_len, max_len))
        cx = np.cumsum(rng.randn(T) * 3) + 320
        cy = np.cumsum(rng.randn(T) * 2) + 240
        w = 40 + 10 * np.sin(np.arange(T) / 17.0)
        h = 50 + 8 * np.cos(np.arange(T) / 23.0)
        gt = [[float(cx[t] - w[t] / 2), float(cy[t] - h[t] / 2),
               float(w[t]), float(h[t])] for t in range(T)]
        # Tracker run: follow gt with noise, fail at random points.
        traj = []
        t = 0
        fail_p = rng.uniform(0.0, 0.02)
        while t < T:
            traj.append([1.0])  # init
            t += 1
            while t < T:
                if rng.rand() < fail_p:
                    traj.append([2.0])  # failure
                    for _ in range(4):  # skipping=5 -> 4 skip frames
                        t += 1
                        if t < T:
                            traj.append([0.0])
                    t += 1
                    break
                dx, dy = rng.randn(2) * 4
                traj.append([gt[t][0] + dx, gt[t][1] + dy,
                             gt[t][2] * (1 + rng.randn() * 0.05),
                             gt[t][3] * (1 + rng.randn() * 0.05)])
                t += 1
        tags = {"camera_motion": (rng.rand(T) > 0.5).astype(float),
                "occlusion": (rng.rand(T) > 0.8).astype(float)}
        seqs.append((f"seq{s}", gt, traj, tags))
    return seqs


@pytest.mark.parametrize("seed", [0, 7])
@pytest.mark.parametrize("tags", [("all",),
                                  ("all", "camera_motion", "occlusion")])
def test_fragment_eao_matches_reference(seed, tags):
    seqs = _synth_sequences(seed)
    ref_mod = _load_reference_eao()
    ref_ds = _RefDataset([_RefVideo(n, gt, [traj], 640, 480, tg)
                          for n, gt, traj, tg in seqs])
    ref_bench = ref_mod.EAOBenchmark(ref_ds, skipping=5,
                                     tags=list(tags))
    ref = ref_bench.eval(["tracker"])["tracker"]

    ours_ds = {n: {"gt_traj": gt, "pred_trajs": {"tracker": [traj]},
                   "width": 640, "height": 480, "tags": tg}
               for n, gt, traj, tg in seqs}
    ours = EAOBenchmark(ours_ds, name="VOT2018", skipping=5,
                        tags=tags).eval("tracker")["tracker"]

    for tag in tags:
        assert ours[tag] == pytest.approx(ref[tag], abs=1e-9), tag


def test_fragment_eao_hand_computed():
    """Tiny fixture where the fragment EAO is computed by hand.

    One sequence, T=8, one failure at index 3, skipping=2 -> fragments:
      frag0 = overlaps[0:6] zero-extended (non-terminal),
      frag1 = overlaps[5:]  NaN-padded (terminal).
    """
    gt = [[0.0, 0.0, 10.0, 10.0]] * 8
    # overlaps: [nan, 1, 1, nan(fail), nan(skip), nan(init), 1, 0.5]
    box = [0.0, 0.0, 10.0, 10.0]
    half = [0.0, 0.0, 10.0, 5.0]  # IoU = 50 / (100 + 50 - 50) = 0.5
    traj = [[1.0], box, box, [2.0], [0.0], [1.0], box, half]
    ds = {"s": {"gt_traj": gt, "pred_trajs": {"t": [traj]}}}
    ov = trajectory_overlaps(traj, gt)
    assert np.isnan(ov[0]) and ov[1] == 1.0 and np.isnan(ov[3])
    assert ov[6] == 1.0 and ov[7] == pytest.approx(0.5)

    # points = [0, 3+2]; frag0 = ov[0:6] (NaN->0) zero-extended to 8,
    # frag1 = ov[5:8] = [0(init NaN), 1, 0.5], NaN-padded.
    f0 = np.array([0, 1, 1, 0, 0, 0, 0, 0], float)
    f1 = np.array([0, 1, 0.5], float)
    # Expected-overlap curve (seq_weight=1, w0=1, w1=3/(8-5)=1):
    L = 8
    exp = np.zeros(L)
    exp[0] = 1
    for i in range(1, L):
        means, ws = [], []
        means.append(f0[1:i + 1].mean())
        ws.append(1.0)
        if i < len(f1):
            means.append(f1[1:i + 1].mean())
            ws.append(1.0)
        exp[i] = np.average(means, weights=ws)
    low, high = 2, 5
    want = exp[low - 1:high].mean()

    got = EAOBenchmark(ds, low=low, high=high,
                       skipping=2).eval("t")["t"]["all"]
    # The curve is float32 (matching the reference kernel's dtype).
    assert got == pytest.approx(want, abs=1e-6)


def test_expected_overlap_curve_matches_reference_kernel():
    _load_reference_eao()
    stats = importlib.import_module("ref_tk.utils.statistics")
    rng = np.random.RandomState(3)
    N, L = 12, 50
    fragments = rng.rand(N, L)
    # NaN tails on half the rows (terminal fragments).
    for i in range(0, N, 2):
        fragments[i, rng.randint(5, L):] = np.nan
    fweights = rng.rand(N)
    ref = stats.calculate_expected_overlap(fragments, fweights)
    ours = expected_overlap_curve(fragments, fweights)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_no_failure_sequences():
    """All-success runs: EAO equals the plain expected overlap."""
    gt = [[0.0, 0.0, 10.0, 10.0]] * 6
    box = [0.0, 0.0, 10.0, 10.0]
    traj = [[1.0]] + [box] * 5
    ds = {"s": {"gt_traj": gt, "pred_trajs": {"t": [traj]}}}
    got = EAOBenchmark(ds, low=2, high=5, skipping=5).eval("t")
    assert got["t"]["all"] == pytest.approx(1.0)


def test_plot_outputs(tmp_path):
    from tao_amodal_tpu.evaluation.sot_plots import (
        draw_eao,
        draw_success_precision,
    )

    success = {"a": {"s1": np.linspace(1, 0, 21),
                     "s2": np.linspace(0.9, 0, 21)},
               "b": {"s1": np.linspace(0.8, 0, 21),
                     "s2": np.linspace(0.7, 0, 21)}}
    precision = {"a": {"s1": np.linspace(0, 1, 51),
                       "s2": np.linspace(0, 0.9, 51)},
                 "b": {"s1": np.linspace(0, 0.8, 51),
                       "s2": np.linspace(0, 0.7, 51)}}
    paths = draw_success_precision(
        success, name="TEST", precision_ret=precision,
        out_prefix=str(tmp_path / "ope"))
    for p in paths:
        assert (tmp_path / p.split("/")[-1]).stat().st_size > 0

    eao = {"a": {"all": 0.4, "camera_motion": 0.3, "occlusion": 0.2},
           "b": {"all": 0.3, "camera_motion": 0.35, "occlusion": 0.1}}
    out = draw_eao(eao, out_path=str(tmp_path / "eao.png"))
    assert (tmp_path / "eao.png").stat().st_size > 0 and out
