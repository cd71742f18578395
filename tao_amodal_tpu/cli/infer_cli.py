"""Inference CLI: video frames -> tracked amodal prediction JSON.

Closes the loop the reference delegates to its companion repos
(GTR detector + Amodal-Expander inference producing
``lvis_instances_results.json``, reference ``README.md:99-116``): run
the flagship pipeline (detector -> expander -> SORT) over a dataset's
videos and write the prediction JSON the evaluator consumes.

Frames load from ``--images_dir`` per the TAO layout
(``frames/<video_name>/<file_name>``); missing frames fall back to
synthetic gray so the pipeline remains exercisable end-to-end without
the dataset.
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def load_clip(images, images_dir, size_hw):
    from PIL import Image

    frames = []
    for im in images:
        path = (os.path.join(images_dir, im["file_name"])
                if images_dir else None)
        if path and os.path.exists(path):
            frames.append(np.asarray(
                Image.open(path).convert("RGB")))
        else:
            frames.append(np.full((*size_hw, 3), 128, np.uint8))
    return np.stack(frames)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--annotation", required=True,
                   help="TAO-Amodal annotation JSON (for video/frame "
                        "ids)")
    p.add_argument("--images_dir", default=None)
    p.add_argument("--output", required=True,
                   help="prediction JSON path "
                        "(lvis_instances_results.json)")
    p.add_argument("--checkpoint", default=None,
                   help="npz pytree of pipeline variables")
    p.add_argument("--input_size", type=int, default=512)
    p.add_argument("--clip_len", type=int, default=8,
                   help="frames per clip program (output-invariant: "
                        "SORT state threads across clips; 8 is the "
                        "measured chip-throughput optimum — "
                        "BENCH_NOTES round-5. Prefer 16 when each "
                        "clip dispatch pays a long host round-trip, "
                        "e.g. a remote-tunnel chip)")
    p.add_argument("--score_threshold", type=float, default=0.05)
    p.add_argument("--num_videos", type=int, default=None)
    # Architecture flags (must match the checkpoint being loaded).
    p.add_argument("--backbone_stages", default="3,4,6,3",
                   help="comma list of ResNet stage sizes")
    p.add_argument("--num_dets", type=int, default=64)
    p.add_argument("--num_proposals", type=int, default=96)
    p.add_argument("--pre_nms_topk", type=int, default=100)
    p.add_argument("--assignment", default="greedy",
                   choices=["greedy", "gated_auction", "auction"])
    p.add_argument("--fused_stages", default="",
                   help="trunk stages for the fused Pallas chain")
    p.add_argument("--sort_on", default="visible",
                   choices=["amodal", "visible"],
                   help="boxes feeding SORT association; 'visible' = "
                        "associate on detector boxes, report amodal "
                        "(the reference decomposition — round-5 "
                        "study)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard video lanes over all devices "
                        "(make_sharded_streaming): groups of "
                        "len(jax.devices()) videos run in lockstep, "
                        "one lane per device, SORT state threaded per "
                        "lane — the v5e-8 serving shape with track "
                        "continuity; output-equivalent to the "
                        "single-stream path")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from tao_amodal_tpu.data.tao import TaoDataset
    from tao_amodal_tpu.ops.pallas.preproc import preprocess_clip
    from tao_amodal_tpu.pipeline import (
        AmodalPipeline,
        make_sharded_streaming,
        video_detections_to_json,
    )

    dataset = TaoDataset(args.annotation)
    # Detector class index i <-> i-th dataset category id.
    cat_ids = sorted(dataset.cats.keys())
    class_id_map = dict(enumerate(cat_ids))
    pipeline = AmodalPipeline.create(
        num_classes=len(cat_ids),
        backbone_stages=tuple(
            int(s) for s in args.backbone_stages.split(",")),
        num_dets=args.num_dets, num_proposals=args.num_proposals,
        pre_nms_topk=args.pre_nms_topk,
        sort_assignment=args.assignment, sort_on=args.sort_on,
        fused_stages=tuple(int(s) for s in args.fused_stages.split(",")
                           if s.strip()))
    S, T = args.input_size, args.clip_len

    if args.checkpoint:
        from tao_amodal_tpu.utils.checkpoint import load_pytree

        variables = load_pytree(args.checkpoint)
    else:
        logger.warning("no checkpoint given: random weights "
                       "(pipeline smoke mode)")
        variables = pipeline.init(
            jax.random.PRNGKey(0), jnp.zeros((2, S, S, 3)))

    @jax.jit
    def run(clip, state):
        return pipeline.streaming(variables, clip, state,
                                  score_thr=args.score_threshold)

    records = []
    vids = sorted(dataset.vids.values(), key=lambda v: v["id"])
    if args.num_videos:
        vids = vids[:args.num_videos]

    if args.data_parallel:
        from tao_amodal_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(model=1)
        B = mesh.shape["data"]
        init_states, run_lanes = make_sharded_streaming(
            pipeline, variables, mesh,
            score_thr=args.score_threshold)
        # Lanes run in lockstep, so group videos by similar length:
        # an exhausted lane idles on zero clips until its group ends.
        order = sorted(
            vids, key=lambda v: -len(dataset.vid_img_map[v["id"]]))
        zero_clip = np.zeros((T, S, S, 3), np.float32)
        for g0 in range(0, len(order), B):
            group = order[g0:g0 + B]
            vid_imgs = [sorted(dataset.vid_img_map[v["id"]],
                               key=lambda im: im["frame_index"])
                       for v in group]
            scales = [min(S / v["height"], S / v["width"])
                      for v in group]
            steps = max((len(ims) + T - 1) // T for ims in vid_imgs)
            # Fresh per group: every lane starts a new video.
            states = init_states()
            by_video = [[] for _ in group]
            for j in range(steps):
                lanes, lane_ids = [], []
                for b in range(B):
                    chunk = (vid_imgs[b][j * T:(j + 1) * T]
                             if b < len(group) else [])
                    if not chunk:  # exhausted or padding lane
                        lanes.append(zero_clip)
                        lane_ids.append([-1] * T)
                        continue
                    pad = T - len(chunk)
                    raw = load_clip(
                        chunk, args.images_dir,
                        (group[b]["height"], group[b]["width"]))
                    clip, _ = preprocess_clip(raw, out_size=S)
                    clip = np.asarray(clip, np.float32)
                    if pad:
                        clip = np.concatenate(
                            [clip, np.zeros((pad, S, S, 3),
                                            np.float32)])
                    lanes.append(clip)
                    lane_ids.append([im["id"] for im in chunk]
                                    + [-1] * pad)
                out, states = run_lanes(jnp.stack(lanes), states)
                out = jax.tree_util.tree_map(np.asarray, out)
                for b in range(len(group)):
                    if all(i == -1 for i in lane_ids[b]):
                        continue
                    lane_out = {k: v[b] for k, v in out.items()}
                    lane_out["boxes"] = lane_out["boxes"] / scales[b]
                    by_video[b].append((lane_out, lane_ids[b]))
            for b, video in enumerate(group):
                records.extend(video_detections_to_json(
                    by_video[b], video["id"],
                    class_id_map=class_id_map,
                    track_id_base=video["id"] * 10 ** 6))
            logger.info("lane group %d..%d (%d lanes): %d records "
                        "so far", g0, g0 + len(group) - 1, len(group),
                        len(records))
        with open(args.output, "w") as f:
            json.dump(records, f)
        logger.info("wrote %d predictions to %s", len(records),
                    args.output)
        return records

    for video in vids:
        images = sorted(dataset.vid_img_map[video["id"]],
                        key=lambda im: im["frame_index"])
        scale = min(S / video["height"], S / video["width"])
        # SORT state threads across the video's clips (continuous
        # track ids past clip boundaries); fresh per video.
        state = pipeline.init_tracker_state()
        clips = []
        for start in range(0, len(images), T):
            chunk = images[start:start + T]
            pad = T - len(chunk)
            raw = load_clip(chunk, args.images_dir,
                            (video["height"], video["width"]))
            # Serving contract: imagenet mean/std (preprocess_clip
            # defaults) — identical to the training normalization
            # (the round-3 closed-loop fix; VERDICT r2 item 2).
            clip, _ = preprocess_clip(raw, out_size=S)
            if pad:
                clip = jnp.concatenate(
                    [clip, jnp.zeros((pad, S, S, 3))])
            out, state = run(clip, state)
            out = jax.tree_util.tree_map(np.asarray, out)
            # Undo the letterbox scale back to source pixels.
            out["boxes"] = out["boxes"] / scale
            clips.append((out, [im["id"] for im in chunk] + [-1] * pad))
        # Whole-video emission: one majority-vote class per track (the
        # GTR output contract; avoids fragmenting tracks per class).
        records.extend(video_detections_to_json(
            clips, video["id"], class_id_map=class_id_map,
            track_id_base=video["id"] * 10 ** 6))
        logger.info("video %s: %d records so far", video["name"],
                    len(records))

    with open(args.output, "w") as f:
        json.dump(records, f)
    logger.info("wrote %d predictions to %s", len(records),
                args.output)
    return records


if __name__ == "__main__":
    main()
