#!/usr/bin/env python
"""Config-5 dress rehearsal: one command, full synthetic set, real chip.

Builds the official TAO-Amodal directory layout (frames on disk,
``amodal_annotations/validation_lvis_v1.json``) at rehearsal scale,
runs the flagship pipeline CLI over every video
(``tools/run_pipeline.py`` -> ``lvis_instances_results.json``), then
the evaluator CLI (``tools/eval_on_tao_amodal.py``), logging wall-clock
and Track-AP — the end-to-end sweep BASELINE.json config 5 describes
(reference flow: ``README.md:101-127``).

Usage (after tools/accuracy_study.py leaves a checkpoint):
  python tools/scale_rehearsal.py \
      --checkpoint /tmp/accuracy_study_r4/ckpt_4000.npz \
      --backbone_stages 1,1,1,1 --num_dets 32 \
      --out experiments/scale_rehearsal.json
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

logger = logging.getLogger("scale_rehearsal")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/scale_rehearsal")
    p.add_argument("--out", default="experiments/scale_rehearsal.json")
    p.add_argument("--videos", type=int, default=16)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--tracks", type=int, default=10)
    p.add_argument("--seed", type=int, default=1000,
                   help="1000 = the accuracy study's val distribution")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--backbone_stages", default="1,1,1,1")
    p.add_argument("--num_dets", type=int, default=32)
    p.add_argument("--num_proposals", type=int, default=128)
    p.add_argument("--pre_nms_topk", type=int, default=100)
    p.add_argument("--score_threshold", type=float, default=0.3)
    p.add_argument("--input_size", type=int, default=512)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from tools.make_dayone_fixture import build

    t0 = time.time()
    root = build(args.workdir, num_videos=args.videos,
                 frames_per_video=args.frames, hw=args.hw,
                 tracks_per_video=args.tracks, seed=args.seed)
    ann = os.path.join(root, "amodal_annotations",
                       "validation_lvis_v1.json")
    build_s = time.time() - t0
    logger.info("fixture built in %.1fs at %s", build_s, root)

    from tao_amodal_tpu.cli.infer_cli import main as infer_main

    pred = os.path.join(root, "lvis_instances_results.json")
    t0 = time.time()
    infer_args = [
        "--annotation", ann,
        "--images_dir", os.path.join(root, "frames"),
        "--output", pred,
        "--input_size", str(args.input_size),
        "--score_threshold", str(args.score_threshold),
        "--backbone_stages", args.backbone_stages,
        "--num_dets", str(args.num_dets),
        "--num_proposals", str(args.num_proposals),
        "--pre_nms_topk", str(args.pre_nms_topk),
    ]
    if args.checkpoint:
        infer_args += ["--checkpoint", args.checkpoint]
    records = infer_main(infer_args)
    infer_s = time.time() - t0
    n_frames = args.videos * args.frames
    logger.info("inference: %d records over %d frames in %.1fs "
                "(%.1f f/s end-to-end incl. JPEG decode)",
                len(records), n_frames, infer_s, n_frames / infer_s)

    from tao_amodal_tpu.cli.eval_cli import main as eval_main

    t0 = time.time()
    det, trk = eval_main([
        "--track_result", pred,
        "--output_log", os.path.join(args.workdir, "eval.log"),
        "--annotation", ann])
    eval_s = time.time() - t0

    summary = {
        "videos": args.videos, "frames_per_video": args.frames,
        "hw": args.hw, "tracks_per_video": args.tracks,
        "checkpoint": args.checkpoint,
        "num_predictions": len(records),
        "build_seconds": round(build_s, 1),
        "infer_seconds": round(infer_s, 1),
        "infer_fps_end_to_end": round(n_frames / infer_s, 1),
        "eval_seconds": round(eval_s, 1),
        "track_map": round(100 * float(trk["TAO 3DmAP"]), 3),
        "track_map50": round(100 * float(trk["TAO 3DmAP50"]), 3),
        "det_ap": round(100 * float(det["AP"]), 3),
        "det_ap50": round(100 * float(det["AP50"]), 3),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    logger.info("summary: %s -> %s", summary, args.out)
    return summary


if __name__ == "__main__":
    main()
