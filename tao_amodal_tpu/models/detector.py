"""GTR-style clip detector: ResNet+FPN+RPN+RoI heads, one XLA graph.

This is the flagship inference model — the detector that produces the
``lvis_instances_results.json`` predictions the evaluator consumes
(BASELINE.json north star; the reference repo links the companion GTR/
detectron2 stack rather than vendoring it, ``README.md:99-101``).

TPU-first design:
  * whole clip as the batch axis: ``[T, H, W, 3]`` frames compile to a
    single program; under pjit the T axis shards over the data mesh
    axis;
  * static proposal/detection budgets everywhere (top-k + masked NMS),
    so there is exactly one compilation per input geometry;
  * bfloat16 trunk, fp32 heads.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tao_amodal_tpu.models.backbones import ResNet
from tao_amodal_tpu.models.fpn import FPN
from tao_amodal_tpu.models.rpn import (
    RPNHead,
    decode_deltas,
    level_anchors,
    select_proposals,
)
from tao_amodal_tpu.ops.nms import class_aware_nms
from tao_amodal_tpu.ops.roi import multilevel_roi_align


class RoIBoxHead(nn.Module):
    """2-fc box head: class logits + per-class-agnostic box deltas."""

    num_classes: int
    features: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):  # [R, s, s, C]
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(self.features, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.features, dtype=self.dtype)(x))
        logits = nn.Dense(self.num_classes + 1, dtype=self.dtype)(x)
        deltas = nn.Dense(4, dtype=self.dtype)(x)
        return logits, deltas, x


class ClipDetector(nn.Module):
    """Per-frame detector applied to a clip.

    ``__call__`` returns, per frame, fixed-size arrays:
    ``boxes [T, D, 4]`` (xyxy), ``scores [T, D]``, ``classes [T, D]``,
    ``roi_features [T, D, F]`` (for the Amodal Expander / association).
    """

    num_classes: int = 80
    features: int = 256
    num_dets: int = 64
    # RoI budget: 96 (was 128).  The resolved closed-loop study
    # (experiments/accuracy_study.json, 3 checkpoints, det AP50 ~77)
    # shows NO detection-AP penalty down to 64 proposals at ~10-object
    # scene density — and the head path (pool + box head) scales
    # linearly with this budget.  Crowded-scene re-measure (round 5,
    # experiments/accuracy_study_r5_crowded.json: 40 objects/video,
    # 8 categories, 3 ckpts x 4 noise groups): 128 buys
    # +0.2/+1.3/+1.2 track-AP50 over 96 but costs 4% end-to-end
    # throughput (2074 -> 1990 f/s, under the 2000 target), so 96
    # stays the default; raise this knob for crowded-vocabulary
    # deployments where that ~1 track-AP point matters.
    num_proposals: int = 96
    # Per-level pre-NMS candidate budget (select_proposals): the
    # proposal NMS cost grows with (levels * pre_nms_topk)^2.
    # 100 (was 150): det-AP deltas vs 150 flip sign across the
    # resolved study's 3 checkpoints (+0.26/-0.03/-0.32 — noise), same
    # acceptance standard as the 96-proposal budget.  Holds EXACTLY at
    # crowded density (round-5 study, 40 objects/video: 300-vs-100
    # deltas within +-0.03 on every metric at all 3 checkpoints).
    pre_nms_topk: int = 100
    anchor_scales: Sequence[float] = (32, 64, 128, 256, 512)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    # RetinaNet-style P3-P7 pyramid: the stride-4 P2 level costs ~2x
    # the rest of the head combined (FPN post-conv + RPN tower on a
    # 128^2 map) for marginal small-object gain at this workload.
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    backbone_stages: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    # RoI pooling implementation over the packed multilevel canvas:
    #   'packed' — XLA two-einsum form (autodiff path; CPU default),
    #   'fused'  — round-4 Pallas kernel, both contractions in VMEM
    #              (0.72 vs 0.85 ms/clip incl. the canvas transpose,
    #              experiments/prroi_pallas_v2.py), exact XLA gradients
    #              via custom_vjp,
    #   'auto'   — 'fused' on TPU, 'packed' elsewhere.
    pooling: str = "auto"
    # Round-2 per-roi-block Pallas kernel. Measured SLOWER than the
    # packed XLA einsum in the full graph (BENCH_NOTES.md round-2:
    # 5.2 vs 1.4 ms/clip) — kept as an opt-in capability.
    pallas_pooling: bool = False
    # int8 post-training-quantized trunk (inference only).
    int8_backbone: bool = False
    # Stem variant (see backbones.ResNet.stem); 's2d_pre' expects the
    # clip already in space-to-depth layout [T, H/4, W/4, 48] from the
    # fused Pallas preprocessing kernel.
    stem: str = "classic"
    # Exact jax.lax.top_k in proposal pre-selection instead of
    # approx_max_k (reference-exact ordering; ~10x slower op).
    exact_topk: bool = False
    # Trunk stages routed through the fused bottleneck-chain Pallas
    # kernel on the inference path (ops/pallas/fused_stage; parity- and
    # gradient-tested).  () = plain XLA convs.
    fused_stages: Sequence[int] = ()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(stage_sizes=tuple(self.backbone_stages),
                               out_stages=(2, 3, 4), dtype=self.dtype,
                               int8=self.int8_backbone,
                               stem=self.stem,
                               fused_stages=tuple(self.fused_stages))
        self.fpn = FPN(self.features, num_extra_levels=2, dtype=self.dtype)
        self.rpn = RPNHead(num_anchors=len(self.anchor_ratios),
                           features=self.features, dtype=self.dtype)
        self.box_head = RoIBoxHead(self.num_classes, dtype=self.dtype)

    def features_for(self, images, train=False):
        feats = self.backbone(images, train=train)
        return self.fpn(feats)

    def pool_rois(self, frame_pyramid, rois):
        """Inference-exact multilevel RoI pooling: P3-P6 with the
        canonical 224^2 roi at P4.  The train loss MUST use this same
        method — pooling train features at a different canonical level
        hands the box head a coarser feature distribution than
        inference does (a silent accuracy killer; found via the
        closed-loop study, VERDICT r2 item 2)."""
        if self.pallas_pooling:
            method = "prroi_packed_pallas"
        else:
            pooling = self.pooling
            if pooling == "auto":
                pooling = ("fused" if any(d.platform == "tpu"
                                          for d in jax.devices())
                           else "packed")
            method = {"packed": "prroi_packed",
                      "fused": "prroi_packed_fused"}[pooling]
        return multilevel_roi_align(
            frame_pyramid[:4], rois, out_size=7, canonical_level=1,
            strides=self.strides[:4], method=method)

    def _frame_detect(self, pyramid, image_hw):
        """Single-frame path (pyramid: list of [H,W,C] per level)."""
        objs, deltas = self.rpn([f[None] for f in pyramid])
        objs = [o[0] for o in objs]
        deltas = [d[0] for d in deltas]
        anchors = [
            level_anchors(o.shape[0], o.shape[1], s,
                          [sc], self.anchor_ratios, dtype=jnp.float32)
            for o, s, sc in zip(objs, self.strides, self.anchor_scales)
        ]
        props, prop_scores = select_proposals(
            objs, deltas, anchors, image_hw,
            pre_nms_topk=self.pre_nms_topk,
            post_nms_topk=self.num_proposals,
            exact_topk=self.exact_topk)

        # Pool over P3-P6 (canonical 224^2 roi -> P4 = index 1).
        pooled = self.pool_rois(pyramid, props)
        logits, box_deltas, feats = self.box_head(pooled)
        probs = jax.nn.softmax(logits, axis=-1)[:, 1:]  # drop background
        boxes = decode_deltas(props, box_deltas)

        # Flatten (proposal, class) -> top num_dets via masked NMS.
        scores = probs * (prop_scores > 0)[:, None]
        cls_ids = jnp.argmax(scores, axis=-1)
        best_scores = jnp.max(scores, axis=-1)
        keep = class_aware_nms(boxes, best_scores, cls_ids, 0.5,
                               self.num_dets)
        valid = keep >= 0
        keep_safe = jnp.maximum(keep, 0)
        return {
            "boxes": boxes[keep_safe] * valid[:, None],
            "scores": jnp.where(valid, best_scores[keep_safe], 0.0),
            "classes": jnp.where(valid, cls_ids[keep_safe], -1),
            "roi_features": feats[keep_safe] * valid[:, None],
        }

    def image_hw_of(self, clip):
        """Original image size: s2d_pre input is 4x-folded."""
        h, w = clip.shape[1:3]
        if self.stem == "s2d_pre":
            return (h * 4, w * 4)
        return (h, w)

    def __call__(self, clip, train=False):
        pyramid = self.features_for(clip, train=train)
        image_hw = self.image_hw_of(clip)

        def per_frame(frame_pyramid):
            return self._frame_detect(frame_pyramid, image_hw)

        # vmap over the time axis of every pyramid level.
        return jax.vmap(per_frame)([p for p in pyramid])
