"""COCO-style greedy score-ordered matching, vectorized.

The reference runs a triple Python loop (threshold x dt x gt) per
(video, category) cell (``tao_amodal/evaluation/tao_amodal/eval.py:396-428``
and the identical per-frame variant ``lvis_amodal/eval.py:245-277``).  The
loop body is equivalent to, per detection (processed in score order):

  1. candidate gts: not yet matched AND iou >= threshold;
  2. among *non-ignored* candidates pick argmax-iou (LAST index on ties:
     the reference's ``ious < iou -> continue`` is a strict-less skip, so
     an equal-iou later gt replaces the running best);
  3. if none, pick argmax-iou among *ignored* candidates (gts are
     pre-sorted ignore-last, and the loop breaks out of the ignore region
     only when a real match was already found — so ignored gts are a
     fallback pool, never an upgrade);
  4. record matched ids; a gt counts as "matched" when its stored dt id
     is ``> 0`` (reference ``eval.py:407``) — we reproduce that quirk
     bit-for-bit, including the consequence that a dt with id <= 0 never
     blocks a gt.

Two implementations with identical results:

  * :func:`greedy_match` — numpy, loops over detections, vectorized over
    the 10 IoU thresholds.  Host-side evaluator default.
  * :func:`greedy_match_jax` — ``lax.scan`` over a padded detection axis,
    ``vmap`` over thresholds; static shapes so whole batches of cells jit
    into one XLA program for the on-device eval path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_EPS_CAP = 1.0 - 1e-10  # reference: iou = min(thr, 1 - 1e-10)


def greedy_match(ious, gt_ig, dt_ids, gt_ids, iou_thrs, unmatched=-1.0):
    """Greedy matcher over one cell; numpy host path.

    Args:
      ious: ``[D, G]`` IoU matrix, detections already score-sorted and gts
        already ignore-last sorted (the caller permutes, as the reference
        does at ``eval.py:371-383``).
      gt_ig: ``[G]`` 0/1 ignore flags (post-permutation).
      dt_ids: ``[D]`` ids stored into ``gt_m`` on match.
      gt_ids: ``[G]`` ids stored into ``dt_m`` on match.
      iou_thrs: ``[T]`` IoU thresholds.
      unmatched: sentinel for unmatched entries; the reference uses ``-1``
        in TaoEval (``eval.py:390-391``) and ``0`` in LVISEval
        (``lvis_amodal/eval.py:239-240``).

    Returns:
      ``(dt_m[T, D], gt_m[T, G], dt_ig_from_match[T, D])`` — matched ids
      (or the sentinel) and, for matched dts, the ignore flag of their gt.
    """
    ious = np.asarray(ious, dtype=np.float64)
    gt_ig = np.asarray(gt_ig)
    dt_ids = np.asarray(dt_ids, dtype=np.float64)
    gt_ids = np.asarray(gt_ids, dtype=np.float64)
    iou_thrs = np.asarray(iou_thrs, dtype=np.float64)

    T = len(iou_thrs)
    D, G = ious.shape
    dt_m = np.full((T, D), unmatched, dtype=np.float64)
    gt_m = np.full((T, G), unmatched, dtype=np.float64)
    dt_igm = np.zeros((T, D), dtype=np.float64)
    if D == 0 or G == 0:
        return dt_m, gt_m, dt_igm

    thr = np.minimum(iou_thrs, _EPS_CAP)[:, None]  # [T,1]

    # Fast path for the (very common) single-gt cell: per threshold the
    # first score-ordered detection clearing it takes the gt.  Only
    # valid when ids are positive (the ``> 0`` matched-test quirk can't
    # fire) — exact otherwise.
    if G == 1 and gt_ig[0] == 0 and dt_ids.min() > 0:
        ok = ious[:, 0][None, :] >= thr            # [T, D]
        has = ok.any(axis=1)
        first = ok.argmax(axis=1)
        t_idx = np.nonzero(has)[0]
        d_idx = first[t_idx]
        dt_m[t_idx, d_idx] = gt_ids[0]
        gt_m[t_idx, 0] = dt_ids[d_idx]
        return dt_m, gt_m, dt_igm

    is_real = (gt_ig == 0)[None, :]                # [1,G]
    # Detections that cannot clear the lowest threshold never match at
    # any threshold; skip them wholesale (big win on sparse matrices).
    row_max = ious.max(axis=1)
    thr_min = thr.min()
    for d in range(D):
        if row_max[d] < thr_min:
            continue
        row = ious[d][None, :]                     # [1,G]
        avail = ~(gt_m > 0)                        # [T,G]  (the ``> 0`` quirk)
        cand = avail & (row >= thr)                # [T,G]
        real = cand & is_real
        ignored = cand & ~is_real

        # argmax with LAST-index tie-break (reverse trick); -inf rows
        # yield garbage indices but are masked off by ``has_*`` below.
        def _last_argmax(mask):
            vals = np.where(mask, ious[d][None, :], -np.inf)
            return G - 1 - np.argmax(vals[:, ::-1], axis=1)

        m_real = _last_argmax(real)
        has_real = real.any(axis=1)
        m_ign = _last_argmax(ignored)
        has_ign = ignored.any(axis=1)

        m = np.where(has_real, m_real, m_ign)
        has = has_real | has_ign

        t_idx = np.nonzero(has)[0]
        if t_idx.size:
            g_idx = m[t_idx]
            dt_m[t_idx, d] = gt_ids[g_idx]
            gt_m[t_idx, g_idx] = dt_ids[d]
            dt_igm[t_idx, d] = gt_ig[g_idx]
    return dt_m, gt_m, dt_igm


def greedy_match_jax(ious, gt_ig, dt_ids, gt_ids, iou_thrs,
                     dt_valid=None, gt_valid=None, unmatched=-1.0):
    """Greedy matcher as one XLA program (scan over D, vmap over T).

    Same semantics as :func:`greedy_match`, on padded static shapes:
    padded detections/gts are masked via ``dt_valid``/``gt_valid`` and
    produce sentinel outputs.  Jitted and cached per (shape, sentinel);
    suitable for vmapping over a batch of (video, category) cells
    bucketed to a common pad size.
    """
    ious = jnp.asarray(ious, jnp.float32)
    D, G = ious.shape
    dt_valid = (jnp.ones((D,), bool) if dt_valid is None
                else jnp.asarray(dt_valid, bool))
    gt_valid = (jnp.ones((G,), bool) if gt_valid is None
                else jnp.asarray(gt_valid, bool))
    return _greedy_match_jit(
        ious, jnp.asarray(gt_ig, jnp.float32),
        jnp.asarray(dt_ids, jnp.float32), jnp.asarray(gt_ids, jnp.float32),
        jnp.asarray(iou_thrs, jnp.float32), dt_valid, gt_valid,
        float(unmatched))


@partial(jax.jit, static_argnames=("unmatched",))
def _greedy_match_jit(ious, gt_ig, dt_ids, gt_ids, iou_thrs, dt_valid,
                      gt_valid, unmatched):
    D, G = ious.shape
    is_real = (gt_ig == 0) & gt_valid

    def one_threshold(thr):
        thr = jnp.minimum(thr, _EPS_CAP)

        def step(gt_match, d):
            row = ious[d]
            avail = ~(gt_match > 0) & gt_valid
            cand = avail & (row >= thr) & dt_valid[d]
            real = cand & is_real
            ignored = cand & ~is_real

            # LAST-index tie-break via reversed argmax.
            score_real = jnp.where(real, row, -jnp.inf)
            score_ign = jnp.where(ignored, row, -jnp.inf)
            m_real = G - 1 - jnp.argmax(score_real[::-1])
            m_ign = G - 1 - jnp.argmax(score_ign[::-1])
            has_real = jnp.any(real)
            has_ign = jnp.any(ignored)
            m = jnp.where(has_real, m_real, m_ign)
            has = has_real | has_ign

            dt_out = jnp.where(has, gt_ids[m], unmatched)
            dt_igm = jnp.where(has, gt_ig[m], 0.0)
            gt_match = jnp.where(
                has & (jnp.arange(G) == m), dt_ids[d], gt_match)
            return gt_match, (dt_out, dt_igm)

        gt_init = jnp.full((G,), unmatched, jnp.float32)
        gt_final, (dt_m, dt_igm) = jax.lax.scan(
            step, gt_init, jnp.arange(D))
        return dt_m, gt_final, dt_igm

    dt_m, gt_m, dt_igm = jax.vmap(one_threshold)(iou_thrs)
    return dt_m, gt_m, dt_igm
