"""SOT tracking + benchmark CLI.

Capability-parity with the reference harnesses (``pysot/tools/
{test,eval,hp_search}.py`` and ``pytracking/run_tracker.py``): run a
tracker over a benchmark dataset, write per-sequence trajectories, and
evaluate OPE success/precision (+ EAO/F1 for VOT-style sets);
``hp-search`` sweeps tracking hyperparameters.
"""

from __future__ import annotations

import argparse
import itertools
import json
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def run_dataset(tracker, dataset, result_dir, tracker_name="tracker"):
    """Run a tracker over every sequence; write ``<seq>.txt``
    trajectories (capability of reference ``run_dataset`` /
    ``tools/test.py`` OPE mode)."""
    out_dir = os.path.join(result_dir, tracker_name)
    os.makedirs(out_dir, exist_ok=True)
    fps_all = []
    for seq in dataset:
        boxes, scores, times = tracker.track(seq.frames, seq.init_box)
        np.savetxt(os.path.join(out_dir, f"{seq.name}.txt"), boxes,
                   delimiter=",", fmt="%.2f")
        np.savetxt(os.path.join(out_dir, f"{seq.name}_confidence.txt"),
                   scores, fmt="%.4f")
        fps = len(boxes) / max(times.sum(), 1e-9)
        fps_all.append(fps)
        logger.info("%s: %d frames, %.1f fps", seq.name, len(boxes),
                    fps)
    return {"mean_fps": float(np.mean(fps_all)) if fps_all else 0.0}


def run_vot_protocol(tracker, dataset, result_dir,
                     tracker_name="tracker", burnin=5,
                     skip_after_failure=5, fail_overlap=0.0):
    """VOT restart protocol (capability of reference
    ``pysot/tools/test.py:62-110``): per frame compare to gt overlap;
    on failure (overlap == ``fail_overlap``), record a failure marker
    and re-initialize ``skip_after_failure`` frames later.

    Writes VOT-style trajectories: ``[1]`` init marker, boxes, ``[2]``
    failure markers, ``[0]`` skipped frames.  Returns accuracy /
    robustness per sequence.
    """
    import numpy as np

    from tao_amodal_tpu.evaluation.sot_benchmarks import (
        calculate_accuracy,
        calculate_failures,
        overlap_ratio,
    )

    def frame_overlap(tracker, box, gt_box, img_hw):
        """Overlap for the restart test: polygon-vs-rect via the
        native VOT region kernel when the tracker emits polygons
        (SiamMask), else axis-aligned IoU (reference ``tools/test.py``
        uses ``vot_overlap`` the same way)."""
        poly = getattr(tracker, "last_polygon", None)
        if poly is not None:
            try:
                from tao_amodal_tpu.native.lib import load as _load

                x, y, w, h = map(float, gt_box)
                gt_poly = [x, y, x + w, y, x + w, y + h, x, y + h]
                return float(_load().polygon_overlap(
                    np.asarray(poly, np.float64), gt_poly,
                    bounds=(img_hw[1], img_hw[0])))
            except Exception:  # noqa: BLE001 (no native lib -> rect)
                pass
        return float(overlap_ratio(np.asarray([gt_box]),
                                   np.asarray([box]))[0])

    out_dir = os.path.join(result_dir, tracker_name, "baseline")
    os.makedirs(out_dir, exist_ok=True)
    summary = {}
    for seq in dataset:
        traj = []
        f = 0
        T = len(seq.frames)
        from PIL import Image

        def frame(i):
            return np.asarray(Image.open(seq.frames[i]).convert("RGB"))

        while f < T:
            tracker.init(frame(f), seq.gt_boxes[f])
            traj.append([1.0])
            f += 1
            while f < T:
                img = frame(f)
                box, score = tracker.update(img)
                ov = frame_overlap(tracker, box, seq.gt_boxes[f],
                                   img.shape[:2])
                if ov <= fail_overlap:
                    traj.append([2.0])
                    for _ in range(skip_after_failure - 1):
                        f += 1
                        if f < T:
                            traj.append([0.0])
                    f += 1
                    break
                traj.append(list(map(float, box)))
                f += 1
        acc, n = calculate_accuracy(traj, seq.gt_boxes, burnin=burnin)
        fails, _ = calculate_failures(traj)
        summary[seq.name] = {"accuracy": acc, "failures": fails}
        with open(os.path.join(out_dir, f"{seq.name}_001.txt"),
                  "w") as fh:
            for entry in traj:
                fh.write(",".join(f"{v:.4f}" for v in entry) + "\n")
        logger.info("%s: acc %.3f, %d failures", seq.name, acc, fails)
    return summary


def track_video(tracker, video_path, init_box, output_path=None):
    """Track one video file (capability of reference
    ``pytracking/evaluation/tracker.py::run_video``)."""
    import cv2
    import numpy as np

    cap = cv2.VideoCapture(video_path)
    boxes = []
    writer_ctx = None
    try:
        first = True
        while True:
            ok, frame_bgr = cap.read()
            if not ok:
                break
            frame = frame_bgr[:, :, ::-1]
            if first:
                tracker.init(frame, init_box)
                box = np.asarray(init_box, float)
                first = False
            else:
                box, _ = tracker.update(frame)
            boxes.append(np.asarray(box))
            if output_path and writer_ctx is None:
                from tao_amodal_tpu.utils.video import video_writer

                writer_ctx = video_writer(
                    output_path, fps=cap.get(cv2.CAP_PROP_FPS) or 30,
                    size_wh=(frame.shape[1], frame.shape[0]))
                writer = writer_ctx.__enter__()
            if output_path:
                from tao_amodal_tpu.utils.vis import vis_bbox

                writer.write_frame(vis_bbox(frame.copy(), box))
    finally:
        cap.release()
        if writer_ctx is not None:
            writer_ctx.__exit__(None, None, None)
    return np.stack(boxes) if boxes else np.zeros((0, 4))


def load_results(dataset, result_dir, tracker_names):
    """Pack written trajectories into the OPE benchmark input."""
    packed = {}
    for seq in dataset:
        entry = {"gt_traj": np.asarray(seq.gt_boxes),
                 "pred_trajs": {}, "pred_scores": {}}
        for name in tracker_names:
            path = os.path.join(result_dir, name, f"{seq.name}.txt")
            if not os.path.exists(path):
                continue
            entry["pred_trajs"][name] = np.loadtxt(path, delimiter=",",
                                                   ndmin=2)
            cpath = os.path.join(result_dir, name,
                                 f"{seq.name}_confidence.txt")
            if os.path.exists(cpath):
                entry["pred_scores"][name] = np.loadtxt(cpath)
        packed[seq.name] = entry
    return packed


def evaluate(dataset, result_dir, tracker_names, plots=False):
    from tao_amodal_tpu.evaluation.sot_benchmarks import OPEBenchmark

    packed = load_results(dataset, result_dir, tracker_names)
    bench = OPEBenchmark(packed)
    success = bench.eval_success(tracker_names)
    precision = bench.eval_precision(tracker_names)
    text = bench.show_result(success, precision)
    print(text)
    if plots:
        from tao_amodal_tpu.evaluation.sot_plots import (
            draw_success_precision)

        paths = draw_success_precision(
            success, name=os.path.basename(result_dir) or "benchmark",
            precision_ret=precision,
            out_prefix=os.path.join(result_dir, "ope"))
        for path in paths:
            logger.info("wrote %s", path)
    return {
        name: float(np.mean([v.mean() for v in seqs.values()]))
        for name, seqs in success.items()
    }


def load_vot_results(dataset, result_dir, tracker_names):
    """Pack VOT restart-protocol trajectories (``baseline/<seq>_*.txt``
    with [1]/[2]/[0] markers, as :func:`run_vot_protocol` writes them)
    into the :class:`EAOBenchmark` dataset format."""
    from glob import glob

    from PIL import Image

    packed = {}
    for seq in dataset:
        w = h = None
        if seq.frames:
            with Image.open(seq.frames[0]) as im:
                w, h = im.size
        entry = {"gt_traj": [list(map(float, b))
                             for b in np.asarray(seq.gt_boxes)],
                 "pred_trajs": {}}
        if w is not None:
            entry["width"], entry["height"] = w, h
        tags = {k: v for k, v in seq.attributes.items()
                if isinstance(v, (list, np.ndarray))
                and len(v) == len(seq.gt_boxes)
                and k != "polygon"}
        if tags:
            entry["tags"] = tags
        for name in tracker_names:
            runs = []
            for path in sorted(glob(os.path.join(
                    result_dir, name, "baseline", f"{seq.name}_*.txt"))):
                with open(path) as fh:
                    runs.append([[float(v) for v in ln.split(",")]
                                 for ln in fh if ln.strip()])
            if runs:
                entry["pred_trajs"][name] = runs
        packed[seq.name] = entry
    return packed


def evaluate_vot(dataset, result_dir, tracker_names, plots=False,
                 dataset_name="VOT2018"):
    """Full VOT evaluation over restart-protocol results: fragment EAO
    (+ radar plot) and per-sequence accuracy/robustness."""
    from tao_amodal_tpu.evaluation.sot_benchmarks import EAOBenchmark

    packed = load_vot_results(dataset, result_dir, tracker_names)
    bench = EAOBenchmark(packed, name=dataset_name)
    result = bench.eval(tracker_names)
    print(bench.show_result(result))
    if plots:
        from tao_amodal_tpu.evaluation.sot_plots import draw_eao

        path = draw_eao(result,
                        out_path=os.path.join(result_dir, "eao.png"))
        if path:
            logger.info("wrote %s", path)
    return result


def hp_search(build_tracker_fn, dataset, result_dir, grid):
    """Hyperparameter sweep (capability of reference
    ``tools/hp_search.py``): grid maps param name -> candidate list."""
    keys = sorted(grid)
    best = (None, -1.0)
    for values in itertools.product(*(grid[k] for k in keys)):
        hp = dict(zip(keys, values))
        name = "hp_" + "_".join(f"{k}{v}" for k, v in hp.items())
        tracker = build_tracker_fn(**hp)
        run_dataset(tracker, dataset, result_dir, tracker_name=name)
        auc = evaluate(dataset, result_dir, [name])[name]
        logger.info("%s -> AUC %.4f", hp, auc)
        if auc > best[1]:
            best = (hp, auc)
    return best


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tracker", default="siamrpn",
                   help="siamrpn | siamrpn_lt | eco | atom | dimp")
    p.add_argument("--dataset", required=True,
                   help="otb | vot | lasot | got10k | trackingnet")
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--result_dir", default="./sot_results")
    p.add_argument("--eval_only", action="store_true")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--plots", action="store_true",
                   help="write success/precision (and EAO, for VOT "
                        "restart results) figures into --result_dir")
    p.add_argument("--vot_protocol", action="store_true",
                   help="run/evaluate the VOT restart protocol "
                        "(fragment EAO) instead of OPE")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from tao_amodal_tpu.data.sot_datasets import load_sot_dataset

    dataset = load_sot_dataset(args.dataset, args.dataset_root)
    if len(dataset) == 0:
        raise SystemExit(f"no sequences found under {args.dataset_root}")
    if not args.eval_only:
        from tao_amodal_tpu.trackers.factory import build_tracker

        kwargs = {}
        if args.checkpoint:
            from tao_amodal_tpu.utils.checkpoint import load_pytree

            kwargs["params"] = load_pytree(args.checkpoint)
        tracker = build_tracker(args.tracker, **kwargs)
        if args.vot_protocol:
            run_vot_protocol(tracker, dataset, args.result_dir,
                             args.tracker)
        else:
            run_dataset(tracker, dataset, args.result_dir, args.tracker)
    if args.vot_protocol:
        return evaluate_vot(dataset, args.result_dir, [args.tracker],
                            plots=args.plots)
    return evaluate(dataset, args.result_dir, [args.tracker],
                    plots=args.plots)


if __name__ == "__main__":
    main()
