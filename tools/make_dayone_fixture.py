#!/usr/bin/env python
"""Build a schema-exact TAO-Amodal directory-tree stand-in.

Produces the official dataset layout (reference ``README.md:66-85``)
from synthetic videos, so every real-data command sequence (the README
"Day one on real data" runbook) can be rehearsed end-to-end with zero
egress:

    TAO-Amodal/
      frames/train/{ArgoVerse,BDD,Charades,HACS,LaSOT,YFCC100M}/<video>/
      amodal_annotations/validation_lvis_v1.json
      example_output/prediction.json        (schema per README.md:107-116)
      BURST_annotations/train/train_visibility.json

``example_output/prediction.json`` is jittered-GT (so the eval CLI
produces non-trivial metrics); the BURST file carries real RLE
segmentations from our codec.

Usage:
  python tools/make_dayone_fixture.py --out /tmp/dayone [--videos 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

SOURCES = ["ArgoVerse", "BDD", "Charades", "HACS", "LaSOT", "YFCC100M"]


def build(out, num_videos=6, frames_per_video=16, hw=160,
          tracks_per_video=4, seed=0, jpeg=True):
    from PIL import Image

    from tao_amodal_tpu.data.synth_video import make_synth_videos
    from tao_amodal_tpu.ops import mask as mask_ops

    root = os.path.join(out, "TAO-Amodal")
    gt, frames_by_video = make_synth_videos(
        seed=seed, num_videos=num_videos,
        frames_per_video=frames_per_video, hw=hw,
        tracks_per_video=tracks_per_video)

    ext = "jpg" if jpeg else "png"
    # Rewrite names into the official source-bucketed layout:
    # video name "train/<SOURCE>/<seq>", file_name relative to frames/.
    names = {}
    for v in gt["videos"]:
        src = SOURCES[(v["id"] - 1) % len(SOURCES)]
        name = f"train/{src}/video_{v['id']:04d}"
        names[v["id"]] = name
        v["name"] = name
        v["metadata"] = {"dataset": src}
    for im in gt["images"]:
        im["file_name"] = (f"{names[im['video_id']]}/"
                           f"frame_{im['frame_index']:04d}.{ext}")

    for im in gt["images"]:
        path = os.path.join(root, "frames", im["file_name"])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(
            frames_by_video[im["video_id"]][im["frame_index"]]
        ).save(path)

    ann_dir = os.path.join(root, "amodal_annotations")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, "validation_lvis_v1.json"),
              "w") as f:
        json.dump(gt, f)

    # example_output/prediction.json: jittered GT, exact official
    # schema and key order (README.md:107-116).
    rng = np.random.RandomState(seed + 1)
    preds = []
    for a in gt["annotations"]:
        if rng.rand() < 0.15:   # missed detections
            continue
        x, y, w, h = a["bbox"]
        jit = rng.randn(4) * 2.0
        preds.append({
            "image_id": a["image_id"],
            "category_id": a["category_id"],
            "bbox": [round(float(x + jit[0]), 2),
                     round(float(y + jit[1]), 2),
                     round(float(max(w + jit[2], 2.0)), 2),
                     round(float(max(h + jit[3], 2.0)), 2)],
            "score": round(float(rng.uniform(0.3, 1.0)), 4),
            "track_id": a["track_id"],
            "video_id": a["video_id"],
        })
    ex_dir = os.path.join(root, "example_output")
    os.makedirs(ex_dir, exist_ok=True)
    with open(os.path.join(ex_dir, "prediction.json"), "w") as f:
        json.dump(preds, f)

    # BURST_annotations: modal masks (visible rectangle) as RLE.
    sequences = []
    anns_by_img = {}
    for a in gt["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)
    imgs_by_video = {}
    for im in gt["images"]:
        imgs_by_video.setdefault(im["video_id"], []).append(im)
    for v in gt["videos"]:
        imgs = sorted(imgs_by_video[v["id"]],
                      key=lambda im: im["frame_index"])
        segmentations = []
        track_cats = {}
        for im in imgs:
            seg = {}
            for a in anns_by_img.get(im["id"], []):
                x, y, w, h = a["bbox"]
                m = np.zeros((v["height"], v["width"]), np.uint8)
                x0, y0 = max(int(x), 0), max(int(y), 0)
                x1 = min(int(x + w), v["width"])
                y1 = min(int(y + h), v["height"])
                if x1 <= x0 or y1 <= y0:
                    continue
                m[y0:y1, x0:x1] = 1
                rle = mask_ops.encode(m)
                seg[str(a["track_id"])] = {
                    "rle": rle["counts"].decode()
                    if isinstance(rle["counts"], bytes)
                    else rle["counts"]}
                track_cats[str(a["track_id"])] = a["category_id"]
            segmentations.append(seg)
        src, seq = v["name"].split("/")[1:]
        sequences.append({
            "id": v["id"], "width": v["width"], "height": v["height"],
            "dataset": src, "seq_name": seq,
            "annotated_image_paths": [
                os.path.basename(im["file_name"]) for im in imgs],
            "segmentations": segmentations,
            "track_category_ids": track_cats,
        })
    burst_dir = os.path.join(root, "BURST_annotations", "train")
    os.makedirs(burst_dir, exist_ok=True)
    with open(os.path.join(burst_dir, "train_visibility.json"),
              "w") as f:
        json.dump({"split": "train", "sequences": sequences}, f)
    return root


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--videos", type=int, default=6)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--hw", type=int, default=160)
    p.add_argument("--tracks", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    root = build(args.out, args.videos, args.frames, args.hw,
                 args.tracks, args.seed)
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        rel = os.path.relpath(dirpath, root)
        if rel.count(os.sep) < 2:
            print(f"{rel}/ ({len(filenames)} files)")
    print("fixture root:", root)
    return root


if __name__ == "__main__":
    main()
