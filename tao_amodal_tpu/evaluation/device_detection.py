"""Device-batched amodal detection (LVIS-style) evaluation.

Per-frame counterpart of :mod:`tao_amodal_tpu.evaluation.device_eval`:
a batch of padded images evaluates in one jitted program across all
(category x visibility-range x threshold) cells — per-image box IoU
matrices are one vmapped broadcast, matching runs under a double vmap
with validity masks, and the OOF pseudo-range rides the same kernel
with a flag.
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.evaluation.detection_eval import (
    AmodalDetectionEvaluator,
)
from tao_amodal_tpu.ops.boxes import box_iou_matrix
from tao_amodal_tpu.ops.matching import greedy_match_jax


@jax.jit
def eval_images_device(dt, gt, cat_ids, vis_rngs, use_oof, iou_thrs,
                       ious=None):
    """Evaluate a padded image batch over all cells.

    Args:
      dt: dict of ``boxes [I, D, 4]`` (xywh), ``scores [I, D]``,
        ``cats [I, D]``, ``nel [I, D]``, ``exists [I, D]``; optional
        ``cell_cats [I, K]`` — per-image candidate category ids (pad
        ``-2``).  When present, cells vmap over the K candidates
        instead of the full category vocabulary: at LVIS scale an image
        touches a handful of the 1.2k categories, so this cuts both the
        cell compute and (critically, for a remote chip) the fetched
        output volume by ~C/K.
      gt: dict of ``boxes [I, G, 4]``, ``vis [I, G]``, ``oof [I, G]``,
        ``ignore0 [I, G]``, ``cats [I, G]``, ``exists [I, G]``.
      cat_ids: ``[C]``; vis_rngs ``[A, 2]``; use_oof ``[A]`` bool.

    Returns per-cell arrays ``[I, C(or K), A, ...]``; match/ignore
    tensors in compact integer dtypes (the PR math upcasts on host).
    """
    if ious is None:
        ious = jax.vmap(lambda d, g: box_iou_matrix(d, g))(
            dt["boxes"].astype(jnp.float32),
            gt["boxes"].astype(jnp.float32))  # [I, D, G]
    else:
        # Precomputed per-image IoU (segm mode: RLE mask IoU from the
        # native run-sweep codec, or mask_iou_dense on device).
        ious = jnp.asarray(ious, jnp.float32)

    def per_image(iou_i, dt_i, gt_i):
        order = jnp.argsort(-dt_i["scores"], stable=True)
        iou_s = iou_i[order]
        D = dt_i["scores"].shape[0]
        G = gt_i["cats"].shape[0]
        # dt_matches travels as int16; gt ids are arange(G)+101.
        assert G + 101 < 2 ** 15, (
            f"padded gt count {G} overflows the int16 match ids")
        dt_ids = (jnp.arange(D, dtype=jnp.float32) + 1.0)[order]

        def one_cell(cat_id, vis_rng, oof_flag):
            dt_mask = (dt_i["cats"] == cat_id) & dt_i["exists"]
            gt_mask = (gt_i["cats"] == cat_id) & gt_i["exists"]
            dt_mask_s = dt_mask[order]
            ig_vis = ((gt_i["ignore0"] != 0)
                      | (gt_i["vis"] < vis_rng[0])
                      | (gt_i["vis"] > vis_rng[1]))
            ig_oof = (gt_i["ignore0"] != 0) | ~gt_i["oof"]
            ignore = jnp.where(oof_flag, ig_oof, ig_vis)
            key = (ignore.astype(jnp.int32)
                   + 2 * (~gt_mask).astype(jnp.int32))
            perm = jnp.argsort(key, stable=True)
            gt_ig = ignore.astype(jnp.float32)[perm]
            gt_ids = (jnp.arange(G, dtype=jnp.float32) + 101.0)[perm]

            dt_m, _, dt_igm = greedy_match_jax(
                iou_s[:, perm], gt_ig, dt_ids, gt_ids, iou_thrs,
                dt_valid=dt_mask_s, gt_valid=gt_mask[perm],
                unmatched=0.0)
            dt_ig_mask = dt_i["nel"][order][None, :]
            dt_ig = jnp.logical_or(
                dt_igm, jnp.logical_and(dt_m == 0, dt_ig_mask))
            return {
                # Compact transfer dtypes: dt_matches holds small
                # non-negative gt ids (0 = unmatched), gt_ignore is a
                # 0/1 flag.
                "dt_matches": dt_m.astype(jnp.int16),
                "dt_ignore": dt_ig,
                "gt_ignore": jnp.where(gt_mask[perm], gt_ig,
                                       1.0).astype(jnp.int8),
                "dt_in_cell": dt_mask_s,
                "cell_valid": jnp.any(dt_mask) | jnp.any(gt_mask),
            }

        over_vis = jax.vmap(one_cell, in_axes=(None, 0, 0))
        over_cat = jax.vmap(over_vis, in_axes=(0, None, None))
        cell_cats = dt_i.get("cell_cats", cat_ids)
        out = over_cat(cell_cats, vis_rngs, use_oof)
        out["dt_scores"] = dt_i["scores"][order]
        return out

    return jax.vmap(per_image)(ious, dt, gt)


def _next_pow2(n, lo=4):
    p = lo
    while p < n:
        p *= 2
    return p


class DeviceDetectionEval(AmodalDetectionEvaluator):
    """AmodalDetectionEvaluator with per-image cells on device."""

    def evaluate(self):
        self.logger.info("Running per image evaluation.")
        self.logger.info(
            "Evaluate annotation type *{}*".format(self.params.iou_type))
        p = self.params
        p.img_ids = list(np.unique(p.img_ids))
        cat_ids = p.cat_ids if p.use_cats else [-1]
        gt_cells, dt_cells = self._prepare_cells()
        self.freq_groups = self._prepare_freq_group()

        per_img = defaultdict(lambda: {"dt": [], "gt": []})
        for (img, _cat), anns in gt_cells.items():
            per_img[img]["gt"].extend(anns)
        for (img, _cat), anns in dt_cells.items():
            per_img[img]["dt"].extend(anns)

        # Bucket images by padded (D, G, K); K bounds the per-image
        # candidate category list (images touch a handful of the
        # vocabulary — vmapping every cell over all C categories wastes
        # ~C/K in compute AND in fetched bytes).
        cat_pos = {cat: c for c, cat in enumerate(cat_ids)}
        buckets = defaultdict(list)
        for i, img_id in enumerate(p.img_ids):
            entry = per_img.get(img_id)
            if entry is None or (not entry["dt"] and not entry["gt"]):
                continue
            present = sorted({a["category_id"]
                              for side in ("dt", "gt")
                              for a in entry[side]
                              if a["category_id"] in cat_pos})
            entry = dict(entry, cats=present)
            D = _next_pow2(max(len(entry["dt"]), 1))
            G = _next_pow2(max(len(entry["gt"]), 1))
            K = _next_pow2(max(len(present), 1))
            buckets[D, G, K].append((i, img_id, entry))

        cat_arr = jnp.asarray(np.asarray(cat_ids, np.int32))
        vis_arr = jnp.asarray(np.asarray(p.visibility_rng, np.float32))
        oof_arr = jnp.asarray(
            np.arange(len(p.visibility_rng))
            == len(p.visibility_rng) - 1)
        thrs = jnp.asarray(np.asarray(p.iou_thrs, np.float32))

        self.eval_imgs = defaultdict(list)
        # Accumulation must see cells in image order regardless of
        # bucket processing order: collect then sort by image index.
        staging = defaultdict(list)

        # Bound the per-call image batch: the device outputs are
        # [n, C, A, T, D]-shaped, so an unchunked many-thousand-image
        # bucket (C=1.2k categories at TAO scale) exhausts HBM.  The
        # chunk size keeps each output under ~100 MB while still
        # amortizing dispatch; the pow2 bucket shape keeps one compiled
        # program per (D, G) regardless of chunking.
        budget = getattr(self, "chunk_budget_bytes", 100 << 20)
        min_chunk = getattr(self, "min_chunk", 32)
        for (D, G, K), bucket_items in buckets.items():
            per_img_bytes = K * len(p.visibility_rng) \
                * len(p.iou_thrs) * (D + G) * 3
            chunk = max(min_chunk,
                        min(4096, budget // max(per_img_bytes, 1)))
            # Fixed chunk length (pow2-capped) so each (D, G, K)
            # bucket compiles once; _pack zero-pads the tail and the
            # unpack loop only reads the real entries.
            chunk = min(chunk, _next_pow2(len(bucket_items),
                                          lo=min_chunk))
            chunks = [bucket_items[s:s + chunk]
                      for s in range(0, len(bucket_items), chunk)]
            self._eval_bucket_chunks(chunks, D, G, K, cat_pos,
                                     vis_arr, oof_arr, thrs, staging, p,
                                     pad_to=chunk)

        for key, entries in staging.items():
            entries.sort(key=lambda item: item[0])
            self.eval_imgs[key] = [e for _, e in entries]

    def _eval_bucket_chunks(self, chunks, D, G, K, cat_pos,
                            vis_arr, oof_arr, thrs, staging, p,
                            pad_to=None):
        for items in chunks:
            dt, gt, ious = self._pack(items, D, G, K, pad_to=pad_to)
            out = eval_images_device(dt, gt, None, vis_arr, oof_arr,
                                     thrs, ious=ious)
            out = {k: np.asarray(v) for k, v in out.items()}
            for bi, (i, img_id, entry) in enumerate(items):
                for k, cat in enumerate(entry["cats"]):
                    if not out["cell_valid"][bi, k, 0]:
                        continue
                    c = cat_pos[cat]
                    for a in range(len(p.visibility_rng)):
                        in_cell = out["dt_in_cell"][bi, k, a]
                        staging[c, a].append((i, {
                            "dt_matches":
                                out["dt_matches"][bi, k, a][:, in_cell],
                            "dt_ignore":
                                out["dt_ignore"][bi, k, a][:, in_cell],
                            "dt_scores": out["dt_scores"][bi][in_cell],
                            "gt_ignore": out["gt_ignore"][bi, k, a],
                        }))

    def _pack(self, items, D, G, K, pad_to=None):
        n = pad_to or len(items)
        dt = {"boxes": np.zeros((n, D, 4), np.float32),
              "scores": np.full((n, D), -np.inf, np.float32),
              "cats": np.full((n, D), -1, np.int32),
              "nel": np.zeros((n, D), bool),
              "exists": np.zeros((n, D), bool),
              # Per-image candidate categories; -2 pad can't collide
              # with the -1 category-agnostic pseudo-id.
              "cell_cats": np.full((n, K), -2, np.int32)}
        gt = {"boxes": np.zeros((n, G, 4), np.float32),
              "vis": np.zeros((n, G), np.float32),
              "oof": np.zeros((n, G), bool),
              "ignore0": np.zeros((n, G), np.float32),
              "cats": np.full((n, G), -1, np.int32),
              "exists": np.zeros((n, G), bool)}
        segm = self.params.iou_type == "segm"
        ious = np.zeros((n, D, G), np.float32) if segm else None
        for b, (_i, img_id, entry) in enumerate(items):
            for k, cat in enumerate(entry["cats"][:K]):
                dt["cell_cats"][b, k] = cat
            for j, ann in enumerate(entry["dt"][:D]):
                dt["boxes"][b, j] = ann["bbox"]
                dt["scores"][b, j] = ann["score"]
                dt["cats"][b, j] = ann["category_id"]
                dt["nel"][b, j] = (ann["category_id"]
                                   in self.img_nel[ann["image_id"]])
                dt["exists"][b, j] = True
            for j, ann in enumerate(entry["gt"][:G]):
                gt["boxes"][b, j] = ann["bbox"]
                gt["vis"][b, j] = ann.get("visibility", 1.0)
                gt["oof"][b, j] = bool(ann.get("out_of_frame", False))
                gt["ignore0"][b, j] = ann.get("ignore", 0)
                gt["cats"][b, j] = ann["category_id"]
                gt["exists"][b, j] = True
            if segm and entry["dt"] and entry["gt"]:
                # Mask IoU on host through the native RLE run-sweep
                # codec (no decode); only the (C, A, T) cell machinery
                # runs on device.  Annotation-order matrix — the device
                # kernel applies its own score sort.
                from tao_amodal_tpu.ops import mask as mask_ops

                m = np.asarray(mask_ops.iou(
                    [a["segmentation"] for a in entry["dt"][:D]],
                    [a["segmentation"] for a in entry["gt"][:G]],
                    [0] * len(entry["gt"][:G])), np.float32)
                ious[b, :m.shape[0], :m.shape[1]] = m
        return ({k: jnp.asarray(v) for k, v in dt.items()},
                {k: jnp.asarray(v) for k, v in gt.items()},
                None if ious is None else jnp.asarray(ious))
