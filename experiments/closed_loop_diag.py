#!/usr/bin/env python
"""Closed-loop diagnostic: isolate WHERE synthetic Track-AP dies.

Stage A: GT boxes emitted as predictions -> Track-AP should be ~100.
Stage B: GT boxes + jittered scores + per-frame-independent SORT-free
         track ids (gt track ids) -> isolates the evaluator/emission.
Stage C: GT boxes run through SORT association (no detector) ->
         isolates the tracker.

All host/CPU — no detector involved.  If A/B/C are all ~100, the
loss is in the detector; if not, the harness itself is the bug.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from tao_amodal_tpu.data.synth_video import make_synth_videos
from tao_amodal_tpu.evaluation.track_eval import TrackMapEvaluator

WORKDIR = "/tmp/closed_loop_diag"


def evaluate(gt_path, records, tag):
    pred_path = os.path.join(WORKDIR, f"preds_{tag}.json")
    with open(pred_path, "w") as f:
        json.dump(records, f)
    ev = TrackMapEvaluator(gt_path, pred_path)
    ev.run()
    print(f"{tag}: Track-AP={100 * ev.results['AP']:.2f} "
          f"AP50={100 * ev.results['AP50']:.2f} "
          f"({len(records)} preds)")
    return ev.results


def main():
    os.makedirs(WORKDIR, exist_ok=True)
    gt, frames = make_synth_videos(seed=1000, num_videos=8,
                                   frames_per_video=32, hw=512,
                                   tracks_per_video=6)
    gt_path = os.path.join(WORKDIR, "gt.json")
    with open(gt_path, "w") as f:
        json.dump(gt, f)

    # Stage A: GT as predictions, perfect ids and classes.
    recs = [{
        "image_id": a["image_id"], "category_id": a["category_id"],
        "bbox": a["bbox"], "score": 0.9, "track_id": a["track_id"],
        "video_id": a["video_id"],
    } for a in gt["annotations"]]
    evaluate(gt_path, recs, "A_gt_perfect")

    # Stage B: GT boxes with +-2px jitter and noisy scores.
    rng = np.random.RandomState(0)
    recs_b = []
    for a in gt["annotations"]:
        x, y, w, h = a["bbox"]
        j = rng.uniform(-2, 2, 4)
        recs_b.append({
            "image_id": a["image_id"], "category_id": a["category_id"],
            "bbox": [x + j[0], y + j[1], w + j[2], h + j[3]],
            "score": float(rng.uniform(0.5, 1.0)),
            "track_id": a["track_id"], "video_id": a["video_id"],
        })
    evaluate(gt_path, recs_b, "B_gt_jittered")

    # Stage C: GT boxes through the real SORT association + the
    # video_detections_to_json emission path (detector bypassed).
    import jax

    # sitecustomize force-sets jax_platforms to "axon,cpu"; this diag
    # must not touch the (single-tenant) TPU tunnel.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tao_amodal_tpu.pipeline import video_detections_to_json
    from tao_amodal_tpu.trackers.sort import init_sort, sort_step

    D = 16
    img_by_video = {}
    for im in gt["images"]:
        img_by_video.setdefault(im["video_id"], []).append(im)
    anns_by_img = {}
    for a in gt["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)

    cat_ids = sorted(c["id"] for c in gt["categories"])
    class_id_map = dict(enumerate(cat_ids))

    @jax.jit
    def assoc_clip(state, boxes, valid):
        def step(s, fr):
            b, v = fr
            s, out = sort_step(s, b, v, max_age=5, min_hits=1,
                               assignment="gated_auction")
            return s, (out["det_track_id"], out["det_report"])
        state, (tids, rep) = jax.lax.scan(step, state, (boxes, valid))
        return state, tids, rep

    records_c = []
    for v, images in sorted(img_by_video.items()):
        images = sorted(images, key=lambda im: im["frame_index"])
        T = len(images)
        boxes = np.zeros((T, D, 4), np.float32)
        valid = np.zeros((T, D), bool)
        classes = np.zeros((T, D), np.int32)
        scores = np.zeros((T, D), np.float32)
        for t, im in enumerate(images):
            for d, a in enumerate(anns_by_img.get(im["id"], [])[:D]):
                x, y, w, h = a["bbox"]
                boxes[t, d] = [x, y, x + w, y + h]
                valid[t, d] = True
                classes[t, d] = a["category_id"] - 1  # 0-indexed fg
                scores[t, d] = 0.9
        state = init_sort(max_tracks=2 * D)
        state, tids, rep = assoc_clip(state, jnp.asarray(boxes),
                                      jnp.asarray(valid))
        out = {
            "boxes": boxes, "scores": scores, "classes": classes,
            "track_ids": np.asarray(tids),
            "valid": valid & np.asarray(rep),
        }
        records_c.extend(video_detections_to_json(
            [(out, [im["id"] for im in images])], v,
            class_id_map=class_id_map, track_id_base=v * 10 ** 6))
    evaluate(gt_path, records_c, "C_gt_through_sort")


if __name__ == "__main__":
    main()
