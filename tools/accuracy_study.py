#!/usr/bin/env python
"""Resolution / proposal-top-k accuracy study on synthetic video data.

Trains a small detector+expander on synthetic TAO-Amodal videos
(``tao_amodal_tpu/data/synth_video.py``) at full resolution, then runs
closed-loop inference -> Track-mAP evaluation across:

  * inference resolutions (512/448/384 letterbox), quantifying the
    Track-AP cost of the resolution lever BENCH_NOTES.md names for the
    2000 f/s/chip target;
  * exact ``jax.lax.top_k`` vs ``approx_max_k`` proposal pre-selection
    (the documented ROADMAP.md deviation — this is its measurement).

Writes one JSON with Track-AP/AP50 per configuration.

Usage:
  python tools/accuracy_study.py --out experiments/accuracy_study.json
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

import numpy as np

logger = logging.getLogger("accuracy_study")


def train(pipeline, gt, frames_by_video, steps, batch_size, seed=0,
          lr=1e-3, augment=True, snapshot_steps=(), max_gt=8,
          paste_n_occlude=False):
    """Train; returns ``{step: variables}`` snapshots (always includes
    the final step)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tao_amodal_tpu.train.detector_loss import detector_train_loss

    pno_bank = None
    if paste_n_occlude:
        from tao_amodal_tpu.train.paste_n_occlude import (
            synthetic_occluder_bank,
        )

        pno_bank = synthetic_occluder_bank(seed=seed)

    hw = gt["images"][0]["height"]
    variables = pipeline.init(jax.random.PRNGKey(seed),
                              jnp.zeros((2, hw, hw, 3)))
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps, 1e-2))
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            lambda v: detector_train_loss(
                pipeline.detector, pipeline.expander, v, batch, rng),
            has_aux=True)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state, \
            loss, metrics

    rng = np.random.RandomState(seed)
    from tao_amodal_tpu.data.synth_video import training_batches

    # Normalize to the serving contract (preprocess_clip's imagenet
    # mean/std): raw 0-255 input through the frozen-BN trunk is badly
    # conditioned, and train MUST match what `infer` feeds.
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])

    snapshots = {}
    t0 = time.time()
    logger.info("training: %d steps, batch %d (first step compiles"
                " the full fwd+bwd graph — minutes on a remote chip)",
                steps, batch_size)
    for i, batch in enumerate(training_batches(
            gt, frames_by_video, rng, batch_size, steps=steps,
            augment=augment, max_gt=max_gt)):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if pno_bank is not None:
            # Paste BEFORE normalization (the bank is 0-255 RGB):
            # occluders composite onto raw pixels, visible boxes
            # shrink, amodal targets stay — the expander's training
            # signal (reference recipe: README.md:99's companion).
            from tao_amodal_tpu.train.paste_n_occlude import (
                paste_n_occlude_batch,
            )

            img, gb, gv, _ = paste_n_occlude_batch(
                batch["images"], batch["gt_boxes"],
                batch["gt_amodal"], batch["gt_valid"], pno_bank,
                jax.random.PRNGKey(7_000_000 + i))
            batch = dict(batch, images=img, gt_boxes=gb, gt_valid=gv)
        batch["images"] = (batch["images"] - mean) / std
        variables, opt_state, loss, metrics = step(
            variables, opt_state, batch, jax.random.PRNGKey(i))
        if i % 100 == 0 or i == steps - 1:
            m = {k: round(float(v), 3) for k, v in metrics.items()}
            logger.info("step %d loss=%.3f %s (%.1fs)", i,
                        float(loss), m, time.time() - t0)
        if (i + 1) in snapshot_steps:
            snapshots[i + 1] = jax.tree_util.tree_map(
                np.asarray, variables)
    snapshots[steps] = jax.tree_util.tree_map(np.asarray, variables)
    return snapshots


def infer(pipeline, variables, gt, frames_by_video, input_size,
          clip_len=16, score_threshold=0.3):
    """Run the pipeline over every video; returns prediction records in
    source-pixel coordinates."""
    import jax
    import jax.numpy as jnp

    from tao_amodal_tpu.pipeline import video_detections_to_json

    cat_ids = sorted(c["id"] for c in gt["categories"])
    class_id_map = dict(enumerate(cat_ids))
    S, T = input_size, clip_len

    @jax.jit
    def run(clip, state):
        return pipeline.streaming(variables, clip, state,
                                  score_thr=score_threshold)

    img_by_video = {}
    for im in gt["images"]:
        img_by_video.setdefault(im["video_id"], []).append(im)

    records = []
    from tao_amodal_tpu.ops.pallas.preproc import preprocess_clip

    for v, images in sorted(img_by_video.items()):
        images = sorted(images, key=lambda im: im["frame_index"])
        H, W = images[0]["height"], images[0]["width"]
        scale = min(S / H, S / W)
        arr = frames_by_video[v]
        state = pipeline.init_tracker_state()
        clips = []
        for start in range(0, len(images), T):
            chunk = images[start:start + T]
            pad = T - len(chunk)
            raw = arr[[im["frame_index"] for im in chunk]]
            clip, _ = preprocess_clip(raw, out_size=S)
            if pad:
                clip = jnp.concatenate(
                    [clip, jnp.zeros((pad, S, S, 3), clip.dtype)])
            out, state = run(clip, state)
            out = jax.tree_util.tree_map(np.asarray, out)
            out["boxes"] = out["boxes"] / scale
            clips.append((out, [im["id"] for im in chunk] + [-1] * pad))
        records.extend(video_detections_to_json(
            clips, v, class_id_map=class_id_map,
            track_id_base=v * 10 ** 6))
    return records


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="experiments/accuracy_study.json")
    p.add_argument("--workdir", default="/tmp/accuracy_study")
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--videos_train", type=int, default=10)
    p.add_argument("--videos_val", type=int, default=8)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--tracks", type=int, default=6,
                   help="objects per video; crowded scenes make the "
                        "proposal-budget lever measurable")
    p.add_argument("--num_categories", type=int, default=3,
                   help="synthetic vocabulary size (crowded-scene "
                        "configs pair density with more categories so "
                        "the classifier and the per-category eval "
                        "protocol are both exercised)")
    p.add_argument("--num_dets", type=int, default=32,
                   help="per-frame detection cap of the study "
                        "detector; raise for crowded-scene configs "
                        "(>= --tracks or the cap censors recall)")
    p.add_argument("--train_steps", type=int, default=500)
    p.add_argument("--checkpoints", default="",
                   help="comma list of intermediate snapshot steps; "
                        "each config evaluates at EVERY checkpoint so "
                        "deltas must hold a consistent sign across "
                        "them (VERDICT r2 item 2)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--resolutions", default="512,448,384")
    p.add_argument("--num_proposals_list", default="64",
                   help="comma list; first is the base config — extra "
                        "entries measure the proposal-budget lever "
                        "(flagship question: 128 -> 96)")
    p.add_argument("--assignments", default="gated_auction",
                   help="comma list of SORT association algorithms")
    p.add_argument("--pre_nms_list", default="150",
                   help="comma list of per-level pre-NMS budgets; "
                        "first is the base config")
    p.add_argument("--score_threshold", type=float, default=0.3)
    p.add_argument("--skip_exact", action="store_true",
                   help="omit the exact-top-k config (resolved in the "
                        "round-3 study; saves one inference per ckpt)")
    p.add_argument("--paste_n_occlude", action="store_true",
                   help="train with PasteNOcclude (synthetic occluders "
                        "pasted over targets; visible gt boxes shrink, "
                        "amodal targets stay — the expander training "
                        "recipe of the reference's companion repo, "
                        "README.md:99)")
    p.add_argument("--expander_ablation", action="store_true",
                   help="add an expander-OFF config (identity boxes: "
                        "the tracker consumes the detector's visible "
                        "frame-clipped boxes) — the control that shows "
                        "whether the Amodal Expander earns its name on "
                        "AP-HP/AP-OOF")
    p.add_argument("--sort_on_ablation", action="store_true",
                   help="add a config that associates SORT on the "
                        "detector's VISIBLE boxes while reporting the "
                        "expander's amodal boxes (the reference "
                        "decomposition: its tracker never sees "
                        "expanded boxes) — tests whether expander "
                        "regression noise in the IoU gate explains "
                        "the track-AP gap vs the identity control")
    p.add_argument("--only_tags", default="",
                   help="comma list: run ONLY configs whose tag is "
                        "listed (with --resume_dir, adds new arms to "
                        "an existing study without re-running the "
                        "rest)")
    p.add_argument("--val_groups", type=int, default=1,
                   help="additionally evaluate Track-AP on N disjoint "
                        "video subsets of the val set, recording the "
                        "per-group spread — the empirical noise scale "
                        "that decides whether a delta is real "
                        "(VERDICT r3 item 2: resolve track-AP50 to "
                        "+-1)")
    p.add_argument("--resume_ckpt", default=None,
                   help="skip training; load variables from this "
                        "save_pytree .npz (e.g. <workdir>/ckpt.npz)")
    p.add_argument("--resume_dir", default=None,
                   help="skip training; load EVERY <dir>/ckpt_<step>"
                        ".npz as the snapshot set (recovers a study "
                        "whose inference phase died after training)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke/testing; the "
                        "axon TPU tunnel serves one process at a time)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    # SIGUSR1 -> thread stacks on stderr (safe liveness probe for the
    # long TPU run; without this the default action kills the run).
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    from tao_amodal_tpu.data.synth_video import make_synth_videos
    from tao_amodal_tpu.evaluation.track_eval import TrackMapEvaluator
    from tao_amodal_tpu.pipeline import AmodalPipeline
    from tao_amodal_tpu.utils.checkpoint import save_pytree

    os.makedirs(args.workdir, exist_ok=True)
    proposals_list = [int(x) for x in
                      args.num_proposals_list.split(",")]
    assignments = args.assignments.split(",")
    arch = dict(num_classes=args.num_categories,
                num_dets=args.num_dets,
                backbone_stages=(1, 1, 1, 1), dtype=dtype)

    gt_train, frames_train = make_synth_videos(
        seed=0, num_videos=args.videos_train,
        frames_per_video=args.frames, hw=args.hw,
        tracks_per_video=args.tracks,
        num_categories=args.num_categories)
    gt_val, frames_val = make_synth_videos(
        seed=1000, num_videos=args.videos_val,
        frames_per_video=args.frames, hw=args.hw,
        tracks_per_video=args.tracks,
        num_categories=args.num_categories)
    gt_path = os.path.join(args.workdir, "gt_val.json")
    with open(gt_path, "w") as f:
        json.dump(gt_val, f)

    snapshot_steps = [int(s) for s in args.checkpoints.split(",")
                      if s.strip()]
    pipeline = AmodalPipeline.create(
        num_proposals=proposals_list[0], **arch)
    if args.resume_dir:
        import glob as _glob

        from tao_amodal_tpu.utils.checkpoint import load_pytree

        snapshots = {}
        for path in sorted(_glob.glob(
                os.path.join(args.resume_dir, "ckpt_*.npz"))):
            step = int(os.path.basename(path)[5:-4])
            snapshots[step] = load_pytree(path)
        assert snapshots, args.resume_dir
        logger.info("resumed %s snapshots from %s",
                    sorted(snapshots), args.resume_dir)
    elif args.resume_ckpt:
        from tao_amodal_tpu.utils.checkpoint import load_pytree

        snapshots = {0: load_pytree(args.resume_ckpt)}
        logger.info("loaded variables from %s", args.resume_ckpt)
    else:
        snapshots = train(pipeline, gt_train, frames_train,
                          args.train_steps, args.batch,
                          snapshot_steps=snapshot_steps,
                          max_gt=max(args.tracks, 8),
                          paste_n_occlude=args.paste_n_occlude)
        for step, variables in snapshots.items():
            save_pytree(os.path.join(args.workdir,
                                     f"ckpt_{step}.npz"), variables)

    resolutions = [int(r) for r in args.resolutions.split(",")]
    pre_nms_list = [int(x) for x in args.pre_nms_list.split(",")]
    base_res, base_p, base_a, base_k = (
        resolutions[0], proposals_list[0], assignments[0],
        pre_nms_list[0])
    # (tag, res, exact_topk, num_proposals, assignment, pre_nms,
    #  use_expander, sort_on)
    configs = [(f"res{r}", r, False, base_p, base_a, base_k, True,
                "amodal")
               for r in resolutions]
    if not args.skip_exact:
        configs.append((f"res{base_res}_exact", base_res, True, base_p,
                        base_a, base_k, True, "amodal"))
    configs += [(f"res{base_res}_p{p}", base_res, False, p, base_a,
                 base_k, True, "amodal")
                for p in proposals_list[1:]]
    configs += [(f"res{base_res}_{a}", base_res, False, base_p, a,
                 base_k, True, "amodal")
                for a in assignments[1:]]
    configs += [(f"res{base_res}_prenms{k}", base_res, False, base_p,
                 base_a, k, True, "amodal")
                for k in pre_nms_list[1:]]
    if args.expander_ablation:
        configs.append((f"res{base_res}_noexpander", base_res, False,
                        base_p, base_a, base_k, False, "amodal"))
    if args.sort_on_ablation:
        configs.append((f"res{base_res}_sortvis", base_res, False,
                        base_p, base_a, base_k, True, "visible"))
    if args.only_tags:
        keep = set(args.only_tags.split(","))
        configs = [c for c in configs if c[0] in keep]
        assert configs, f"--only_tags matched nothing: {keep}"

    from tao_amodal_tpu.evaluation.detection_eval import (
        AmodalDetectionEvaluator,
    )

    # Disjoint val-video groups: per-group Track-AP spread = the
    # empirical noise scale for judging config deltas.
    val_vids = sorted({im["video_id"] for im in gt_val["images"]})
    groups, group_paths = [], []
    if args.val_groups > 1:
        per = max(1, len(val_vids) // args.val_groups)
        groups = [set(val_vids[i * per:(i + 1) * per])
                  for i in range(args.val_groups)]
        for gi, vids in enumerate(groups):
            sub = {
                "videos": [v for v in gt_val["videos"]
                           if v["id"] in vids],
                "images": [im for im in gt_val["images"]
                           if im["video_id"] in vids],
                "annotations": [a for a in gt_val["annotations"]
                                if a["video_id"] in vids],
                "tracks": [t for t in gt_val["tracks"]
                           if t["video_id"] in vids],
                "categories": gt_val["categories"],
            }
            path = os.path.join(args.workdir, f"gt_val_g{gi}.json")
            with open(path, "w") as f:
                json.dump(sub, f)
            group_paths.append(path)

    results = {}
    if os.path.exists(args.out) and (args.resume_dir
                                     or args.resume_ckpt):
        # Resume runs EXTEND the existing study file (e.g. --only_tags
        # adds a new arm to already-recorded cells) instead of
        # clobbering it.
        with open(args.out) as f:
            results = json.load(f)
        logger.info("extending %s (%d existing cells)", args.out,
                    len(results))
    for ckpt_step, variables in sorted(snapshots.items()):
        for (tag, res, exact, num_p, assign, pre_k,
             use_exp, s_on) in configs:
            if f"ckpt{ckpt_step}_{tag}" in results:
                # Resume semantics: a cell already recorded in --out is
                # final (the r5 crowded run was OOM-killed at cell 8 of
                # 12; --resume_dir + this skip reruns only the rest).
                logger.info("skip existing cell ckpt%s_%s",
                            ckpt_step, tag)
                continue
            pipe = AmodalPipeline.create(
                exact_topk=exact, num_proposals=num_p,
                sort_assignment=assign, pre_nms_topk=pre_k,
                use_expander=use_exp, sort_on=s_on, **arch)
            t0 = time.time()
            try:
                records = infer(pipe, variables, gt_val, frames_val,
                                res,
                                score_threshold=args.score_threshold)
            except Exception as e:
                # Retry ONLY the transient tunnel/remote-compile
                # failures actually observed (HTTP 500s surfacing as
                # INTERNAL/UNAVAILABLE XlaRuntimeError); deterministic
                # bugs (shape errors, OOM, config typos) re-raise
                # immediately (ADVICE r4).
                msg = f"{type(e).__name__}: {e}"
                transient = any(s in msg for s in (
                    "INTERNAL", "UNAVAILABLE", "DEADLINE_EXCEEDED",
                    "500", "Socket closed", "Connection reset"))
                if not transient:
                    raise
                logger.warning("transient infer failure (%s); "
                               "retrying in 60s", msg.splitlines()[0])
                time.sleep(60)
                records = infer(pipe, variables, gt_val, frames_val,
                                res,
                                score_threshold=args.score_threshold)
            infer_s = time.time() - t0
            pred_path = os.path.join(
                args.workdir, f"preds_{ckpt_step}_{tag}.json")
            with open(pred_path, "w") as f:
                json.dump(records, f)
            ev = TrackMapEvaluator(gt_path, pred_path)
            ev.run()
            det = AmodalDetectionEvaluator(gt_path, pred_path, "bbox")
            det.run()
            key = f"ckpt{ckpt_step}_{tag}"
            results[key] = {
                "track_ap": round(100 * float(ev.results["AP"]), 3),
                "track_ap50": round(
                    100 * float(ev.results["AP50"]), 3),
                # The namesake metrics (VERDICT r4 item 2): the amodal
                # occlusion splits of both evaluators — reference
                # headline surface at tools/eval_on_tao_amodal.py:72-84
                # (3DmAP-HP) and lvis_amodal/eval.py:567-575 (the
                # visibility ranges).
                "track_ap_hp": round(
                    100 * float(ev.results["AP-HP"]), 3),
                "track_ap50_hp": round(
                    100 * float(ev.results["AP50-HP"]), 3),
                "det_ap": round(100 * float(det.results["AP"]), 3),
                "det_ap50": round(
                    100 * float(det.results["AP50"]), 3),
                "det_ap_hp": round(
                    100 * float(det.results["AP-HP"]), 3),
                "det_ap50_hp": round(
                    100 * float(det.results["AP50-HP"]), 3),
                "det_ap_ho": round(
                    100 * float(det.results["AP-HO"]), 3),
                "det_ap_po": round(
                    100 * float(det.results["AP-PO"]), 3),
                "det_ap_oof": round(
                    100 * float(det.results["AP-OOF"]), 3),
                "det_ap50_oof": round(
                    100 * float(det.results["AP50-OOF"]), 3),
                "num_predictions": len(records),
                "infer_seconds": round(infer_s, 1),
            }
            if groups:
                g_ap50, g_ap50_hp, g_det_hp, g_det_oof = [], [], [], []
                for gi, vids in enumerate(groups):
                    sub_rec = [r for r in records
                               if r["video_id"] in vids]
                    sp = os.path.join(
                        args.workdir,
                        f"preds_{ckpt_step}_{tag}_g{gi}.json")
                    with open(sp, "w") as f:
                        json.dump(sub_rec, f)
                    gev = TrackMapEvaluator(group_paths[gi], sp)
                    gev.run()
                    g_ap50.append(
                        round(100 * float(gev.results["AP50"]), 3))
                    g_ap50_hp.append(
                        round(100 * float(gev.results["AP50-HP"]), 3))
                    gdet = AmodalDetectionEvaluator(
                        group_paths[gi], sp, "bbox")
                    gdet.run()
                    g_det_hp.append(round(
                        100 * float(gdet.results["AP50-HP"]), 3))
                    g_det_oof.append(round(
                        100 * float(gdet.results["AP50-OOF"]), 3))
                results[key]["track_ap50_groups"] = g_ap50
                results[key]["track_ap50_hp_groups"] = g_ap50_hp
                results[key]["det_ap50_hp_groups"] = g_det_hp
                results[key]["det_ap50_oof_groups"] = g_det_oof
            logger.info("%s: %s", key, results[key])
            # Incremental write: a crash partway keeps the data.
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
            # Each cell jit-compiles a distinct pipeline config; the
            # accumulated executable/trace caches grew the r5 crowded
            # run to >100 GB RSS over 8 cells until the kernel OOM
            # killer took it. Cells are independent — drop the caches.
            import gc

            jax.clear_caches()
            gc.collect()

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    logger.info("wrote %s", args.out)
    return results


if __name__ == "__main__":
    main()
