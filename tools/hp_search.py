#!/usr/bin/env python
"""Tracking hyperparameter search as ONE batched TPU program.

The reference sweeps (penalty_k, window_influence, lr) by queueing an
independent full tracker run per grid cell on a pool of GPUs
(``pysot/tools/hp_search.py``).  Here the grid is a vmapped batch
axis: all N cells track every sequence in lockstep inside a single
XLA program per sequence (template embedded once, backbone/xcorr
batched over cells on the MXU), then per-cell OPE success AUC picks
the winner.

Usage:
  python tools/hp_search.py --dataset otb --dataset_root DIR \
      --penalty_k 0.02,0.04,0.08 --window_influence 0.3,0.44,0.6 \
      --lr 0.25,0.4,0.55 [--checkpoint ckpt.msgpack]
"""
import argparse
import itertools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_grid(args):
    axes = {
        "penalty_k": [float(v) for v in args.penalty_k.split(",")],
        "window_influence": [float(v)
                             for v in args.window_influence.split(",")],
        "lr": [float(v) for v in args.lr.split(",")],
    }
    cells = list(itertools.product(axes["penalty_k"],
                                   axes["window_influence"],
                                   axes["lr"]))
    return axes, np.asarray(cells, np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="otb")
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--penalty_k", default="0.02,0.04,0.08,0.16")
    p.add_argument("--window_influence", default="0.30,0.44,0.60")
    p.add_argument("--lr", default="0.25,0.40,0.55")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None,
                   help="write the full per-cell table as JSON")
    p.add_argument("--max_frames", type=int, default=0,
                   help="cap frames per sequence (0 = all)")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from tao_amodal_tpu.data.sot_datasets import load_sot_dataset
    from tao_amodal_tpu.evaluation.sot_benchmarks import success_overlap
    from tao_amodal_tpu.trackers.factory import build_tracker
    from tao_amodal_tpu.trackers.siamrpn import make_siamrpn_hp_sweep

    _, grid = parse_grid(args)
    dataset = load_sot_dataset(args.dataset, args.dataset_root)
    if len(dataset) == 0:
        raise SystemExit(f"no sequences under {args.dataset_root}")

    tracker = build_tracker("siamrpn", **(
        {"params": __import__(
            "tao_amodal_tpu.utils.checkpoint", fromlist=["load_pytree"]
        ).load_pytree(args.checkpoint)} if args.checkpoint else {}))
    sweep = make_siamrpn_hp_sweep(tracker.model, tracker.params,
                                  tracker.cfg)

    N = len(grid)
    aucs = np.zeros((N,))
    n_seq = 0
    for seq in dataset:
        frames = np.stack([
            np.asarray(Image.open(f).convert("RGB"))
            for f in (seq.frames[:args.max_frames]
                      if args.max_frames else seq.frames)])
        gt = np.asarray(seq.gt_boxes)[:len(frames)]
        boxes, _ = sweep(jnp.asarray(frames),
                         np.asarray(seq.init_box, np.float32),
                         jnp.asarray(grid))
        boxes = np.asarray(boxes)                       # [N, T, 4]
        for i in range(N):
            aucs[i] += success_overlap(gt, boxes[i][:len(gt)]).mean()
        n_seq += 1
        print(f"{seq.name}: {len(frames)} frames x {N} cells swept")
    aucs /= max(n_seq, 1)

    order = np.argsort(-aucs)
    print(f"\n{'penalty_k':>10} {'win_infl':>10} {'lr':>8} {'AUC':>8}")
    for i in order[:10]:
        pk, wi, lr = grid[i]
        print(f"{pk:>10.3f} {wi:>10.3f} {lr:>8.3f} {aucs[i]:>8.4f}")
    best = grid[order[0]]
    print(f"\nbest: penalty_k={best[0]:.3f} "
          f"window_influence={best[1]:.3f} lr={best[2]:.3f} "
          f"AUC={aucs[order[0]]:.4f}")
    if args.output:
        with open(args.output, "w") as fh:
            json.dump({"grid": grid.tolist(), "auc": aucs.tolist(),
                       "best": best.tolist()}, fh, indent=2)
    return {"best": best.tolist(), "auc": float(aucs[order[0]])}


if __name__ == "__main__":
    main()
