"""Seeded synthetic TAO-Amodal fixtures.

Generates a GT annotation dict (same JSON schema as the reference,
documented at reference ``tao_amodal/evaluation/tao_amodal/tao.py:1-61``)
plus a prediction list (schema per reference ``README.md:107-116``),
exercising every evaluator code path: merged categories, negative /
not-exhaustive category lists, visibility/out-of-frame fields, score
ties, cross-video track-id collisions, unmatched dts and gts, and
varying track durations/areas.
"""

from __future__ import annotations

import numpy as np


def make_fixture(seed=0, num_videos=6, frames_per_video=24, num_cats=9,
                 tracks_per_video=7, det_noise=6.0, drop_rate=0.25,
                 extra_fp=4, score_tie_prob=0.3, img_size=(640, 480)):
    rng = np.random.RandomState(seed)
    W, H = img_size

    categories = []
    for c in range(1, num_cats + 1):
        cat = {
            "id": c,
            "name": f"cat_{c}",
            "synset": "unknown",
            "frequency": ["r", "c", "f"][c % 3],
        }
        categories.append(cat)
    # Category num_cats+1 is merged into category 1 (exercises the
    # merge map, reference ``tao.py:97-118``).
    categories[0]["merged"] = [{"id": num_cats + 1, "name": "merged_cat"}]

    videos = []
    images = []
    tracks = []
    annotations = []
    img_id = 1
    track_id = 1
    ann_id = 1

    for v in range(1, num_videos + 1):
        all_cats = list(range(1, num_cats + 1))
        rng.shuffle(all_cats)
        neg = sorted(all_cats[:2])
        nel = sorted(all_cats[2:4])
        videos.append({
            "id": v,
            "name": f"video_{v}",
            "width": W,
            "height": H,
            "neg_category_ids": neg,
            "not_exhaustive_category_ids": nel,
            "metadata": {"dataset": ["ArgoVerse", "BDD", "Charades", "HACS",
                                     "LaSOT", "YFCC100M"][v % 6]},
        })
        vid_img_ids = []
        for f in range(frames_per_video):
            images.append({
                "id": img_id,
                "video_id": v,
                "file_name": f"video_{v}/frame_{f:04d}.jpg",
                "license": 0,
                "width": W,
                "height": H,
                "frame_index": f,
                "neg_category_ids": neg,
                "not_exhaustive_category_ids": nel,
            })
            vid_img_ids.append(img_id)
            img_id += 1

        for _ in range(tracks_per_video):
            cat = int(rng.randint(1, num_cats + 1))
            tracks.append({"id": track_id, "category_id": cat,
                           "video_id": v})
            # Random contiguous-ish frame support.
            start = int(rng.randint(0, frames_per_video // 2))
            dur = int(rng.randint(1, frames_per_video - start + 1))
            cx, cy = rng.uniform(50, W - 50), rng.uniform(50, H - 50)
            w0, h0 = rng.uniform(16, 150), rng.uniform(16, 150)
            vx, vy = rng.uniform(-4, 4, size=2)
            for f in range(start, start + dur):
                if rng.rand() < 0.15:
                    continue  # sparse annotation gaps
                x = np.clip(cx + vx * (f - start) - w0 / 2, 0, W - 8)
                y = np.clip(cy + vy * (f - start) - h0 / 2, 0, H - 8)
                w = min(w0, W - x)
                h = min(h0, H - y)
                vis = float(np.round(rng.uniform(0, 1), 3))
                annotations.append({
                    "id": ann_id,
                    "image_id": vid_img_ids[f],
                    "track_id": track_id,
                    "bbox": [float(np.round(x, 1)), float(np.round(y, 1)),
                             float(np.round(w, 1)), float(np.round(h, 1))],
                    "area": float(np.round(w, 1)) * float(np.round(h, 1)),
                    "category_id": cat,
                    "visibility": vis,
                    "out_of_frame": bool(rng.rand() < 0.15),
                })
                ann_id += 1
            track_id += 1

    gt = {
        "info": {"description": "synthetic TAO-Amodal fixture"},
        "images": images,
        "videos": videos,
        "tracks": tracks,
        "annotations": annotations,
        "categories": categories,
        "licenses": [{"id": 0, "name": "synthetic", "url": ""}],
    }

    # ------------------------------------------------------------------
    # Predictions: noised copies of gt tracks + false positives.
    # ------------------------------------------------------------------
    preds = []
    img_by_id = {im["id"]: im for im in images}
    pred_track = 1  # deliberately reused across videos -> collisions
    per_video_tracks = {}
    for ann in annotations:
        per_video_tracks.setdefault(
            (img_by_id[ann["image_id"]]["video_id"], ann["track_id"]),
            []).append(ann)

    vid_local_idx = {}
    for (v, tid), anns in per_video_tracks.items():
        if rng.rand() < drop_rate:
            continue
        base_score = float(np.round(rng.uniform(0.2, 0.99), 2))
        tie = rng.rand() < score_tie_prob
        # Some predictions use the merged-away category id to exercise
        # the merge map on the results path.
        cat = anns[0]["category_id"]
        if cat == 1 and rng.rand() < 0.5:
            cat = num_cats + 1  # merged-away id
        # Track ids: unique within a video, but the ``100 + local`` pool
        # repeats across videos -> exercises make_track_ids_unique.
        local = vid_local_idx.get(v, 0)
        vid_local_idx[v] = local + 1
        ptid = (100 + local) if rng.rand() < 0.5 else 10000 + tid
        pred_track += 1
        for ann in anns:
            if rng.rand() < 0.1:
                continue
            x, y, w, h = ann["bbox"]
            nx = float(np.round(max(0.0, x + rng.uniform(-det_noise,
                                                         det_noise)), 1))
            ny = float(np.round(max(0.0, y + rng.uniform(-det_noise,
                                                         det_noise)), 1))
            nw = float(np.round(max(4.0, w + rng.uniform(-det_noise,
                                                         det_noise)), 1))
            nh = float(np.round(max(4.0, h + rng.uniform(-det_noise,
                                                         det_noise)), 1))
            score = base_score if tie else float(
                np.round(np.clip(base_score + rng.uniform(-0.1, 0.1),
                                 0.01, 1.0), 3))
            preds.append({
                "image_id": ann["image_id"],
                "category_id": cat,
                "bbox": [nx, ny, nw, nh],
                "score": score,
                "track_id": ptid,
                "video_id": v,
            })

    # Pure false positives (some in neg/nel categories).  Track ids are
    # unique per FP (a same-video id collision across categories is
    # invalid input — the results API asserts one category per track).
    for fp_idx in range(extra_fp * num_videos):
        v = int(rng.randint(1, num_videos + 1))
        f = int(rng.randint(0, frames_per_video))
        imid = (v - 1) * frames_per_video + f + 1
        cat = int(rng.randint(1, num_cats + 1))
        preds.append({
            "image_id": imid,
            "category_id": cat,
            "bbox": [float(rng.uniform(0, W - 60)),
                     float(rng.uniform(0, H - 60)),
                     float(rng.uniform(10, 60)), float(rng.uniform(10, 60))],
            "score": float(np.round(rng.uniform(0.05, 0.9), 2)),
            "track_id": 5_000_000 + fp_idx,
            "video_id": v,
        })

    return gt, preds
