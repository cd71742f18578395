#!/usr/bin/env python
"""At-scale evaluator stress + parity + wall-clock comparison.

Generates a reference-scale synthetic TAO-Amodal fixture (hundreds of
videos, ~100 categories, ~100k annotations), then runs

  1. our host evaluators (TrackMapEvaluator / AmodalDetectionEvaluator),
  2. our device-batched evaluators  (--device_eval),
  3. the reference evaluators imported from /root/reference as the
     oracle (--with_reference),

asserts metric parity, and reports wall-clock + peak RSS for each.

Usage:
  python tools/stress_eval.py --num_videos 500 --num_cats 100 \
      --with_reference
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num_videos", type=int, default=500)
    p.add_argument("--frames_per_video", type=int, default=48)
    p.add_argument("--num_cats", type=int, default=100)
    p.add_argument("--tracks_per_video", type=int, default=12)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--with_reference", action="store_true")
    p.add_argument("--device_eval", action="store_true")
    p.add_argument("--out", default=None,
                   help="write the JSON summary here too")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (leave the TPU free)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: the device-eval timings below measure
    # execution, not the (tunnel-bound) one-time XLA compiles.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fixture_gen import make_fixture

    from tao_amodal_tpu.data.results import make_track_ids_unique

    t0 = time.perf_counter()
    gt, preds = make_fixture(
        seed=args.seed, num_videos=args.num_videos,
        frames_per_video=args.frames_per_video,
        num_cats=args.num_cats,
        tracks_per_video=args.tracks_per_video)
    make_track_ids_unique(preds)
    gen_s = time.perf_counter() - t0
    print(f"fixture: {len(gt['videos'])} videos, "
          f"{len(gt['annotations'])} gt anns, {len(preds)} preds, "
          f"{len(gt['categories'])} cats ({gen_s:.1f}s)")

    summary = {"videos": len(gt["videos"]),
               "gt_anns": len(gt["annotations"]),
               "preds": len(preds), "cats": len(gt["categories"])}

    import copy

    def timed(name, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        summary[name + "_s"] = round(dt, 2)
        print(f"{name:24s}: {dt:8.2f}s  (peak RSS {rss_mb():.0f} MB)")
        return out

    # --- ours, host --------------------------------------------------
    from tao_amodal_tpu.evaluation import (
        AmodalDetectionEvaluator,
        TrackMapEvaluator,
    )

    def run_host_track():
        ev = TrackMapEvaluator(copy.deepcopy(gt), copy.deepcopy(preds))
        ev.run()
        return ev.get_results()

    def run_host_det():
        ev = AmodalDetectionEvaluator(copy.deepcopy(gt),
                                      copy.deepcopy(preds), "bbox")
        ev.run()
        return ev.get_results()

    host_track = timed("host_track", run_host_track)
    host_det = timed("host_detection", run_host_det)

    # --- ours, device ------------------------------------------------
    if args.device_eval:
        from tao_amodal_tpu.evaluation.device_detection import (
            DeviceDetectionEval,
        )
        from tao_amodal_tpu.evaluation.device_eval import DeviceTrackEval

        def run_dev_track():
            ev = DeviceTrackEval(copy.deepcopy(gt), copy.deepcopy(preds))
            ev.run()
            return ev.get_results()

        def run_dev_det():
            ev = DeviceDetectionEval(copy.deepcopy(gt),
                                     copy.deepcopy(preds), "bbox")
            ev.run()
            return ev.get_results()

        dev_track = timed("device_track", run_dev_track)
        dev_det = timed("device_detection", run_dev_det)
        # Device IoU is float32 (host oracle is float64): exact ties
        # and threshold-boundary IoUs (e.g. a pair whose f64 IoU is
        # exactly 0.75) can flip a match, moving metrics in the ~1e-5
        # decimals at this scale. 2e-3 matches the repo-wide device
        # parity tolerance (tests/test_device_eval.py) while still
        # catching protocol divergence.
        for k in host_track:
            assert abs(host_track[k] - dev_track[k]) < 2e-3, (
                "device track mismatch", k, host_track[k], dev_track[k])
        for k in host_det:
            assert abs(host_det[k] - dev_det[k]) < 2e-3, (
                "device det mismatch", k, host_det[k], dev_det[k])
        print("device == host: OK (atol 2e-3; float32 IoU flips)")

    # --- reference oracle ---------------------------------------------
    if args.with_reference:
        import tempfile

        from reference_oracle import load_reference

        ref_tao, ref_lvis = load_reference()
        tmpd = tempfile.mkdtemp(prefix="stress_eval_")
        gt_path = os.path.join(tmpd, "gt.json")
        pred_path = os.path.join(tmpd, "preds.json")
        with open(gt_path, "w") as f:
            json.dump(gt, f)
        with open(pred_path, "w") as f:
            json.dump(preds, f)

        def run_ref_track():
            ev = ref_tao.TaoEval(ref_tao.Tao(gt_path),
                                 copy.deepcopy(preds))
            ev.run()
            return ev.get_results()

        def run_ref_det():
            ev = ref_lvis.LVISEval(gt_path, pred_path, "bbox")
            ev.run()
            return ev.get_results()

        ref_track = timed("reference_track", run_ref_track)
        ref_det = timed("reference_detection", run_ref_det)
        for k in ref_track:
            assert abs(host_track[k] - ref_track[k]) < 1e-9, (
                "track parity", k, host_track[k], ref_track[k])
        for k in ref_det:
            assert abs(host_det[k] - ref_det[k]) < 1e-9, (
                "det parity", k, host_det[k], ref_det[k])
        print("parity vs reference: OK "
              f"({len(ref_track)} + {len(ref_det)} metrics exact)")
        summary["track_speedup_vs_reference"] = round(
            summary["reference_track_s"] / summary["host_track_s"], 2)
        summary["det_speedup_vs_reference"] = round(
            summary["reference_detection_s"]
            / summary["host_detection_s"], 2)

    summary["peak_rss_mb"] = round(rss_mb(), 1)
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    return summary


if __name__ == "__main__":
    main()
