"""Track-mAP evaluation as batched device programs.

The host evaluator (:mod:`tao_amodal_tpu.evaluation.track_eval`) is the
float64 parity oracle; this module is the TPU path: one jitted program
evaluates a whole padded video across ALL (category, area-range,
time-range, iou-threshold) cells simultaneously —

  * one track-IoU matrix per video (``track_iou_matrix``);
  * per-category cells via validity masks (no ragged slicing): the
    greedy matcher's ``dt_valid``/``gt_valid`` masks select the cell,
    a stable per-category permutation orders gts ignore-last;
  * vmap over categories x ranges; the score ordering is one global
    stable sort (invalid detections are skipped by the scan).

Videos bucket to shared pad sizes so the whole validation sweep
compiles once per bucket.  PR accumulation
(:func:`pr_curves_device`) is cumsum + reverse-max + searchsorted in
jnp, vmappable over every cell.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.ops.matching import greedy_match_jax
from tao_amodal_tpu.ops.track_iou import track_iou_matrix


@partial(jax.jit, static_argnames=("hp_min_frames",))
def eval_video_device(dt, gt, cat_ids, area_rngs, time_rngs, use_occ,
                      iou_thrs, hp_min_frames=6, ious=None):
    """Evaluate one padded video over all cells.

    Args:
      dt: dict with ``boxes [D, F, 4]``, ``frame_valid [D, F]``,
        ``scores [D]``, ``cats [D]``, ``areas [D]``, ``durs [D]``,
        ``nel [D]`` (category-not-exhaustive flag), ``exists [D]``.
      gt: dict with ``boxes [G, F, 4]``, ``frame_valid [G, F]``,
        ``cats [G]``, ``areas [G]``, ``durs [G]``, ``hp_frames [G]``,
        ``ignore0 [G]``, ``exists [G]``.
      cat_ids: ``[C]`` category ids to evaluate.
      area_rngs: ``[A, 2]``; time_rngs: ``[Tm, 2]``;
      use_occ: ``[A]`` bool — HP pseudo-range flag per area range.
      iou_thrs: ``[T]``.

    Returns dict of per-cell arrays keyed ``[C, A, Tm, ...]``:
      ``dt_matches [.., T, D]``, ``dt_ignore [.., T, D]``,
      ``gt_ignore [.., G]``, ``cell_valid [C]`` plus the score order.
    """
    D = dt["scores"].shape[0]
    G = gt["cats"].shape[0]
    # dt_matches travels as int16 (compact transfer dtype); gt ids are
    # arange(G)+101, so the padded track count must fit in int16.
    assert G + 101 < 2 ** 15, (
        f"padded gt track count {G} overflows the int16 match ids")

    if ious is None:
        ious = track_iou_matrix(
            dt["boxes"], dt["frame_valid"], gt["boxes"],
            gt["frame_valid"], xp=jnp).astype(jnp.float32)
    else:
        ious = jnp.asarray(ious, jnp.float32)

    # Global stable score-descending order for detections.
    order = jnp.argsort(-dt["scores"], stable=True)
    ious_sorted = ious[order]
    dt_ids = (jnp.arange(D, dtype=jnp.float32) + 1.0)[order]

    def one_cell(cat_id, area_rng, time_rng, occ_flag):
        dt_mask = (dt["cats"] == cat_id) & dt["exists"]
        gt_mask = (gt["cats"] == cat_id) & gt["exists"]
        dt_mask_sorted = dt_mask[order]

        ignore = ((gt["ignore0"] != 0)
                  | (gt["areas"] < area_rng[0])
                  | (gt["areas"] > area_rng[1])
                  | (gt["durs"] < time_rng[0])
                  | (gt["durs"] > time_rng[1]))
        ignore = ignore | (occ_flag
                           & (gt["hp_frames"] <= hp_min_frames - 1))
        # Order gts: valid non-ignored, valid ignored, padding.
        key = (ignore.astype(jnp.int32)
               + 2 * (~gt_mask).astype(jnp.int32))
        perm = jnp.argsort(key, stable=True)
        gt_ig = ignore.astype(jnp.float32)[perm]
        gt_ids = (jnp.arange(G, dtype=jnp.float32) + 101.0)[perm]

        dt_m, gt_m, dt_igm = greedy_match_jax(
            ious_sorted[:, perm], gt_ig, dt_ids, gt_ids, iou_thrs,
            dt_valid=dt_mask_sorted, gt_valid=gt_mask[perm],
            unmatched=-1.0)

        dt_ig_mask = ((dt["areas"] < area_rng[0])
                      | (dt["areas"] > area_rng[1])
                      | (dt["durs"] < time_rng[0])
                      | (dt["durs"] > time_rng[1])
                      | dt["nel"])[order][None, :]
        dt_ig = jnp.logical_or(
            dt_igm, jnp.logical_and(dt_m == -1, dt_ig_mask))
        cell_has = jnp.any(dt_mask) | jnp.any(gt_mask)
        return {
            # Compact transfer dtypes (fetch volume is the cost on a
            # remote chip): dt_matches holds small local gt ids
            # (-1 = unmatched), gt_ignore is a 0/1 flag; the host PR
            # math only tests ``!= -1`` / ``== 0``.
            "dt_matches": dt_m.astype(jnp.int16),
            "dt_ignore": dt_ig,
            "gt_ignore": jnp.where(gt_mask[perm], gt_ig,
                                   1.0).astype(jnp.int8),
            "dt_in_cell": dt_mask_sorted,
            "cell_valid": cell_has,
        }

    over_time = jax.vmap(one_cell, in_axes=(None, None, 0, None))
    over_area = jax.vmap(over_time, in_axes=(None, 0, None, 0))
    over_cat = jax.vmap(over_area, in_axes=(0, None, None, None))
    # Per-video candidate categories (``dt["cell_cats"] [K]``, pad -2)
    # replace the full vocabulary when provided — a video touches a
    # handful of categories, so cells and fetched bytes shrink ~C/K.
    cell_cats = dt.get("cell_cats", cat_ids)
    out = over_cat(cell_cats, area_rngs, time_rngs, use_occ)
    out["dt_scores"] = dt["scores"][order]
    out["dt_order"] = order
    return out


@jax.jit
def pr_curves_device(tps, fps, num_gt, rec_thrs):
    """Vectorized PR summary on device.

    Args:
      tps / fps: ``[..., T, N]`` bool with N globally score-sorted.
      num_gt: ``[...]`` per-cell non-ignored gt counts.

    Returns (precision ``[..., T, R]``, recall ``[..., T]``) with the
    reference's right-max interpolation and left searchsorted
    semantics; cells with num_gt == 0 give -1 (absent).
    """
    tp = jnp.cumsum(tps, axis=-1).astype(jnp.float32)
    fp = jnp.cumsum(fps, axis=-1).astype(jnp.float32)
    num_gt_f = jnp.maximum(num_gt, 1)[..., None, None]
    rc = tp / num_gt_f
    pr = tp / (fp + tp + jnp.finfo(jnp.float32).eps)
    # Right-max interpolation: reversed cumulative max.
    pr = jax.lax.cummax(pr[..., ::-1], axis=pr.ndim - 1)[..., ::-1]

    # searchsorted per threshold row (vmapped over leading dims).
    def sample(rc_row, pr_row):
        idx = jnp.searchsorted(rc_row, rec_thrs, side="left")
        valid = idx < rc_row.shape[0]
        return jnp.where(valid, pr_row[jnp.minimum(idx,
                                                   rc_row.shape[0] - 1)],
                         0.0)

    flat_rc = rc.reshape(-1, rc.shape[-1])
    flat_pr = pr.reshape(-1, pr.shape[-1])
    prec = jax.vmap(sample)(flat_rc, flat_pr)
    prec = prec.reshape(rc.shape[:-1] + (rec_thrs.shape[0],))
    recall = rc[..., -1]
    absent = (num_gt == 0)[..., None]
    prec = jnp.where(absent[..., None], -1.0, prec)
    recall = jnp.where(absent, -1.0, recall)
    return prec, recall


def pack_video(cells_dt, cells_gt, pad_d, pad_g, num_frames):
    """Host-side packing of one video's tracks into padded arrays.

    Args are lists of per-track dicts with ``boxes {frame->bbox}``
    etc.; see tests for the exact schema.  Returns (dt, gt) dicts for
    :func:`eval_video_device`.
    """
    def pack(tracks, pad, is_gt):
        boxes = np.zeros((pad, num_frames, 4), np.float32)
        fvalid = np.zeros((pad, num_frames), bool)
        cats = np.full((pad,), -1, np.int32)
        areas = np.zeros((pad,), np.float32)
        durs = np.zeros((pad,), np.float32)
        exists = np.zeros((pad,), bool)
        extra = {}
        if is_gt:
            extra["hp_frames"] = np.zeros((pad,), np.float32)
            extra["ignore0"] = np.zeros((pad,), np.float32)
        else:
            extra["scores"] = np.full((pad,), -np.inf, np.float32)
            extra["nel"] = np.zeros((pad,), bool)
        for i, tr in enumerate(tracks[:pad]):
            for f, b in tr["boxes"].items():
                boxes[i, f] = b
                fvalid[i, f] = True
            cats[i] = tr["category_id"]
            areas[i] = tr["area"]
            durs[i] = tr["duration"]
            exists[i] = True
            if is_gt:
                extra["hp_frames"][i] = tr.get("hp_frames", 0)
                extra["ignore0"][i] = tr.get("ignore", 0)
            else:
                extra["scores"][i] = tr["score"]
                extra["nel"][i] = tr.get("nel", False)
        out = {"boxes": boxes, "frame_valid": fvalid, "cats": cats,
               "areas": areas, "durs": durs, "exists": exists}
        out.update(extra)
        return out

    return pack(cells_dt, pad_d, False), pack(cells_gt, pad_g, True)
