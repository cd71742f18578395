"""Flagship pipeline: detect -> amodal-expand -> associate, on device.

The end-to-end path the BASELINE.json north star measures
(frames/sec/chip for detect+expand+track): a clip ``[T, H, W, 3]`` runs
through the ClipDetector (one XLA graph), the AmodalExpander widens
visible boxes to amodal ones, and SORT association runs as a
``lax.scan`` over frames — zero host round-trips inside a clip.

Outputs use the prediction-JSON contract (`README.md:107-116` of the
reference): per-frame (bbox xywh, score, category, track_id), which
:func:`detections_to_json` serializes for the evaluator CLI.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.models.amodal_expander import AmodalExpander
from tao_amodal_tpu.models.detector import ClipDetector
from tao_amodal_tpu.trackers.sort import init_sort, sort_step


class AmodalPipeline(NamedTuple):
    detector: ClipDetector
    expander: AmodalExpander
    # SORT lifecycle: classic SORT defaults are (max_age=1, min_hits=3)
    # — a track dies after ONE missed frame.  TAO video at ~1 fps
    # annotation / 30 fps frames with a jittery detector fragments
    # badly under that; the flagship default keeps tracks alive through
    # short occlusions/missed detections (quantified in
    # experiments/accuracy_study.json).
    sort_max_age: int = 5
    sort_min_hits: int = 1
    # Association algorithm: 'greedy' (parallel mutual-best rounds —
    # flagship default: +1.8% end-to-end throughput, Track-AP
    # equivalent to the auction across the resolved study's 3
    # checkpoints) or 'gated_auction' (Hungarian-optimal within the
    # IoU gate — the reference's optimal-assignment semantics, 32x
    # faster than the full price war).
    sort_assignment: str = "greedy"
    # Ablation switch: False bypasses the Amodal Expander and reports
    # the detector's visible (modal, frame-clipped) boxes as the
    # output — the "identity expander" control the amodal-metric study
    # compares against (the expander must beat it on AP-HP/AP-OOF or
    # it isn't earning its name).  Init still creates expander params
    # so checkpoints stay interchangeable between the two settings.
    use_expander: bool = True
    # Which boxes feed SORT association: 'visible' (flagship default —
    # associate on the detector's modal boxes, REPORT the expander's
    # amodal ones; the reference decomposition: its tracker associates
    # on detector boxes and the expander expands each detection
    # afterwards, so expander regression noise never touches the IoU
    # gate) or 'amodal' (association and reporting share the expander
    # output).  The round-5 study (accuracy_study_r5_pno.json, 3 ckpts
    # x 4 noise groups) makes 'visible' the shipped default:
    # +12.5..+20.8 Track-AP50 over 'amodal' (sign-stable, clears the
    # 6.8 group spread) with the expander's det amodal gains fully
    # intact (det AP50-HP/OOF within +-0.3 of the 'amodal' arm, vs the
    # identity control's -8.6/-13.0).
    sort_on: str = "visible"

    @staticmethod
    def create(num_classes=80, num_dets=64, dtype=jnp.float32,
               backbone_stages=(3, 4, 6, 3), num_proposals=96,
               pallas_pooling=False, int8_backbone=False,
               stem="classic", exact_topk=False,
               sort_max_age=5, sort_min_hits=1,
               sort_assignment="greedy", pre_nms_topk=100,
               pooling="auto", fused_stages=(), use_expander=True,
               sort_on="visible"):
        return AmodalPipeline(
            detector=ClipDetector(num_classes=num_classes,
                                  num_dets=num_dets, dtype=dtype,
                                  num_proposals=num_proposals,
                                  backbone_stages=backbone_stages,
                                  pooling=pooling,
                                  pallas_pooling=pallas_pooling,
                                  int8_backbone=int8_backbone,
                                  stem=stem, exact_topk=exact_topk,
                                  pre_nms_topk=pre_nms_topk,
                                  fused_stages=fused_stages),
            expander=AmodalExpander(dtype=dtype),
            sort_max_age=sort_max_age,
            sort_min_hits=sort_min_hits,
            sort_assignment=sort_assignment,
            use_expander=use_expander,
            sort_on=sort_on,
        )

    def preprocess(self, frames, out_size=512, use_pallas=None):
        """uint8 frames ``[T, H, W, 3]`` -> the tensor ``__call__``
        consumes (s2d layout when the detector uses the s2d_pre stem).
        Returns (clip, scale)."""
        from tao_amodal_tpu.ops.pallas.preproc import (
            preprocess_clip,
            preprocess_clip_s2d,
        )

        if self.detector.stem == "s2d_pre":
            # Preproc computes in the trunk dtype: bf16 on the serving
            # path halves the resize intermediates' HBM traffic (uint8
            # pixels are exact in bf16; weights round at ~1e-3).
            return preprocess_clip_s2d(frames, out_size=out_size,
                                       use_pallas=use_pallas,
                                       compute_dtype=self.detector.dtype)
        return preprocess_clip(frames, out_size=out_size,
                               use_pallas=use_pallas)

    def init(self, rng, clip):
        r1, r2 = jax.random.split(rng)
        det_vars = self.detector.init(r1, clip)
        D = self.detector.num_dets
        exp_vars = self.expander.init(
            r2, jnp.zeros((D, 1024)), jnp.zeros((D, 4)),
            image_hw=self.detector.image_hw_of(clip))
        return {"detector": det_vars, "expander": exp_vars}

    def init_tracker_state(self):
        """Fresh SORT state (reset at every video boundary)."""
        return init_sort(max_tracks=2 * self.detector.num_dets)

    def streaming(self, variables, clip, sort_state, score_thr=0.05):
        """Clip -> (tracked amodal detections, updated SORT state).

        Threading the state across consecutive clips of one video keeps
        track identities continuous past clip boundaries (a fresh state
        per clip would fragment every track into 16-frame pieces AND
        reuse the same ids for different objects)."""
        det = self.detector.apply(variables["detector"], clip)
        if self.use_expander:
            amodal, _ = self.expander.apply(
                variables["expander"], det["roi_features"],
                det["boxes"], image_hw=self.detector.image_hw_of(clip))
        else:
            amodal = det["boxes"]

        det_valid = det["scores"] > score_thr

        def assoc(state, frame):
            boxes, valid = frame
            # Default 'greedy': parallel mutual-best rounds,
            # Track-AP-equivalent to the Hungarian-parity
            # 'gated_auction' on the resolved closed-loop study (see
            # BENCH_NOTES + trackers/sort.py).
            state, out = sort_step(state, boxes, valid,
                                   max_age=self.sort_max_age,
                                   min_hits=self.sort_min_hits,
                                   assignment=self.sort_assignment)
            return state, (out["det_track_id"], out["det_report"])

        # unroll: the association chain is inherently sequential, but
        # unrolling lets XLA fuse the small per-frame ops across
        # iterations instead of paying loop plumbing per frame.
        assoc_boxes = (det["boxes"] if self.sort_on == "visible"
                       else amodal)
        sort_state, (track_ids, reported) = jax.lax.scan(
            assoc, sort_state, (assoc_boxes, det_valid), unroll=16)
        return {
            "boxes": amodal,                  # [T, D, 4] xyxy amodal
            "visible_boxes": det["boxes"],    # [T, D, 4]
            "scores": det["scores"],          # [T, D]
            "classes": det["classes"],        # [T, D]
            "track_ids": track_ids,           # [T, D]
            "valid": det_valid & reported,    # [T, D]
        }, sort_state

    def __call__(self, variables, clip, score_thr=0.05):
        """Full clip -> tracked amodal detections (all on device)."""
        out, _ = self.streaming(variables, clip,
                                self.init_tracker_state(),
                                score_thr=score_thr)
        return out

    def batched(self, variables, clips, sort_states=None,
                score_thr=0.05):
        """B videos' clips ``[B, T, H, W, C]`` in ONE program.

        The production per-chip serving shape: a chip works several
        videos concurrently (videos are independent streams).  The
        detector and expander are per-frame, so the B and T axes fold
        into one ``[B*T]`` frame batch — 4x the MXU work per dispatch
        of the small head ops (proposal selection, NMS, box head) whose
        single-video shapes under-fill the chip — while the
        order-sensitive SORT scan runs vmapped over the B per-video
        states.  Exactly equal to B separate :meth:`streaming` calls.

        Returns (outputs with a leading B axis, updated sort states);
        thread ``sort_states`` across consecutive clip batches of the
        same videos, as in :meth:`streaming`.
        """
        B, T = clips.shape[0], clips.shape[1]
        if sort_states is None:
            sort_states = jax.vmap(
                lambda _: self.init_tracker_state())(jnp.arange(B))
        flat = clips.reshape((B * T,) + clips.shape[2:])
        det = self.detector.apply(variables["detector"], flat)
        if self.use_expander:
            amodal, _ = self.expander.apply(
                variables["expander"], det["roi_features"],
                det["boxes"], image_hw=self.detector.image_hw_of(flat))
        else:
            amodal = det["boxes"]
        det_valid = det["scores"] > score_thr

        def assoc(state, frame):
            boxes, valid = frame
            state, out = sort_step(state, boxes, valid,
                                   max_age=self.sort_max_age,
                                   min_hits=self.sort_min_hits,
                                   assignment=self.sort_assignment)
            return state, (out["det_track_id"], out["det_report"])

        def per_video(state, boxes, valid):
            return jax.lax.scan(assoc, state, (boxes, valid), unroll=16)

        unflat = lambda a: a.reshape((B, T) + a.shape[1:])
        assoc_boxes = (det["boxes"] if self.sort_on == "visible"
                       else amodal)
        sort_states, (track_ids, reported) = jax.vmap(per_video)(
            sort_states, unflat(assoc_boxes), unflat(det_valid))
        return {
            "boxes": unflat(amodal),
            "visible_boxes": unflat(det["boxes"]),
            "scores": unflat(det["scores"]),
            "classes": unflat(det["classes"]),
            "track_ids": track_ids,
            "valid": unflat(det_valid) & reported,
        }, sort_states


def detections_to_json(outputs, image_ids, video_id, class_id_map=None,
                       track_id_base=0, track_key_map=None):
    """Device outputs -> prediction-JSON records (host side).

    Args:
      outputs: dict from :class:`AmodalPipeline` (numpy-convertible).
      image_ids: ``[T]`` dataset image ids for the clip frames.
      track_id_base: added to every track id — pass a per-video offset
        (e.g. ``video_id * 10**6``) so ids are globally unique, as the
        results loader requires (reference ``results.py`` asserts one
        video per track id).
      track_key_map: dict threading (sort_track_id, category) -> local
        track index across a video's clips.  The results loader also
        asserts ONE category per track (reference ``tao.py:148-149``);
        SORT association is class-agnostic, so a track whose per-frame
        argmax class drifts must split into one eval track per class.
        Pass the same dict for every clip of a video (fresh per video);
        ``None`` emits the raw SORT track ids instead, which stay
        globally consistent across clips of one threaded SORT state (a
        fresh local map per clip would make ids restart at 0 and
        collide distinct tracks from different clips).
    """
    boxes = np.asarray(outputs["boxes"])
    scores = np.asarray(outputs["scores"])
    classes = np.asarray(outputs["classes"])
    tracks = np.asarray(outputs["track_ids"])
    valid = np.asarray(outputs["valid"])
    records = []
    for t, img_id in enumerate(image_ids):
        for d in np.nonzero(valid[t])[0]:
            x0, y0, x1, y1 = boxes[t, d]
            cat = int(classes[t, d])
            if class_id_map is not None:
                cat = class_id_map.get(cat, cat)
            if track_key_map is None:
                local = int(tracks[t, d])
            else:
                key = (int(tracks[t, d]), cat)
                local = track_key_map.setdefault(key, len(track_key_map))
            records.append({
                "image_id": int(img_id),
                "category_id": cat,
                "bbox": [float(x0), float(y0), float(x1 - x0),
                         float(y1 - y0)],
                "score": float(scores[t, d]),
                "track_id": local + track_id_base,
                "video_id": int(video_id),
            })
    return records


def video_detections_to_json(clips, video_id, class_id_map=None,
                             track_id_base=0):
    """Whole-video emission with ONE class per track (majority vote).

    Args:
      clips: list of ``(outputs, image_ids)`` pairs — every clip of one
        video, in order, from :meth:`AmodalPipeline.streaming` with the
        SORT state threaded through.

    SORT association is class-agnostic, so a track's per-frame argmax
    class can drift; the results loader requires one category per track
    (reference ``tao.py:148-149``).  Instead of splitting the track per
    class (:func:`detections_to_json`, which fragments tracks and
    collapses 3D track IoU), assign each track its score-weighted
    majority class over the whole video — the same one-class-per-track
    output contract as the reference's GTR tracker.  Requires buffering
    a video's outputs host-side; use the streaming variant only when
    that is not possible.
    """
    votes = {}
    for outputs, image_ids in clips:
        classes = np.asarray(outputs["classes"])
        scores = np.asarray(outputs["scores"])
        tracks = np.asarray(outputs["track_ids"])
        valid = np.asarray(outputs["valid"])
        for t in range(len(image_ids)):
            if image_ids[t] == -1:
                continue
            for d in np.nonzero(valid[t])[0]:
                key = int(tracks[t, d])
                votes.setdefault(key, {})
                cat = int(classes[t, d])
                votes[key][cat] = votes[key].get(cat, 0.0) \
                    + float(scores[t, d])
    track_class = {k: max(v.items(), key=lambda kv: kv[1])[0]
                   for k, v in votes.items()}

    records = []
    for outputs, image_ids in clips:
        boxes = np.asarray(outputs["boxes"])
        scores = np.asarray(outputs["scores"])
        tracks = np.asarray(outputs["track_ids"])
        valid = np.asarray(outputs["valid"])
        for t, img_id in enumerate(image_ids):
            if img_id == -1:
                continue
            for d in np.nonzero(valid[t])[0]:
                x0, y0, x1, y1 = boxes[t, d]
                cat = track_class[int(tracks[t, d])]
                if class_id_map is not None:
                    cat = class_id_map.get(cat, cat)
                records.append({
                    "image_id": int(img_id),
                    "category_id": cat,
                    "bbox": [float(x0), float(y0), float(x1 - x0),
                             float(y1 - y0)],
                    "score": float(scores[t, d]),
                    "track_id": int(tracks[t, d]) + track_id_base,
                    "video_id": int(video_id),
                })
    return records


def make_inference_fn(pipeline, variables):
    """Jitted clip-inference function (compile once per geometry)."""

    @jax.jit
    def run(clip):
        return pipeline(variables, clip)

    return run


def make_sharded_inference(pipeline, variables, mesh):
    """Pod-scale inference: a batch of clips ``[B, T, H, W, 3]`` with B
    sharded over the mesh's 'data' axis — each chip runs its clips'
    full detect+expand+associate locally (videos are independent, so
    scaling is embarrassingly parallel over ICI with zero collectives;
    this is the v5e-8 deployment shape of the BASELINE north star).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    clip_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(rep, clip_sharding),
             out_shardings=clip_sharding)
    def run(variables, clips):
        return jax.vmap(lambda c: pipeline(variables, c))(clips)

    return lambda clips: run(variables, clips)


def make_sharded_streaming(pipeline, variables, mesh, score_thr=0.05):
    """Pod-scale SERVING: B concurrent video streams, one lane per
    'data'-axis slot, with each lane's SORT state threaded across its
    video's consecutive clips.

    :func:`make_sharded_inference` scales the *stateless* clip program
    (the bench shape — a fresh tracker per clip); serving whole videos
    additionally needs track identities to survive clip boundaries on
    every lane (reference semantics: its per-frame trackers are
    stateful by construction, ``trackers/sot/base.py:59-102``).  This
    wraps :meth:`AmodalPipeline.batched` in ONE jitted program with the
    clips AND the per-lane SORT states sharded over 'data' (params
    replicated): each chip runs its own lanes' detect+expand+associate
    locally — zero collectives, like the stateless path — and the
    returned states feed the next clip batch of the same videos.

    Returns ``(init_states, run)``:
      - ``init_states() -> states`` — fresh [B]-leading SORT-state
        pytree placed with the lane sharding (B = mesh 'data' size);
        build a fresh one per group of B videos (a lane's state must
        reset at its video boundary, exactly like the single-stream
        path resets per video).
      - ``run(clips, states) -> (outputs, states)`` — clips
        ``[B, T, H, W, C]`` (preprocessed, one video per lane); every
        output leaf carries the leading lane axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    lane = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    B = mesh.shape["data"]

    def init_states():
        states = jax.vmap(
            lambda _: pipeline.init_tracker_state())(jnp.arange(B))
        return jax.device_put(states, lane)

    @partial(jax.jit,
             in_shardings=(rep, lane, lane),
             out_shardings=(lane, lane))
    def run(variables, clips, states):
        return pipeline.batched(variables, clips, sort_states=states,
                                score_thr=score_thr)

    return init_states, lambda clips, states: run(variables, clips,
                                                  states)
