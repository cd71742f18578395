"""SORT: batched Kalman + device Hungarian, fixed track-slot bank.

Capability-parity rebuild of the reference SORT
(``visualization/tao/third_party/sort/sort.py:204-262`` and the
``SortWithDetectionId`` variant at ``sort_with_detection_id.py:6-73``)
with a TPU-first architecture:

  * a fixed bank of ``max_tracks`` slots (alive mask) instead of a
    Python list of tracker objects — every step is one jitted XLA
    program over static shapes;
  * Kalman predict/update batched over slots
    (:mod:`tao_amodal_tpu.ops.kalman`);
  * IoU cost + auction assignment on device
    (:mod:`tao_amodal_tpu.ops.hungarian`), threshold 0.3 as in the
    reference (``sort.py:210``);
  * max_age / min_hits lifecycle as masked integer updates.

Semantics preserved: detections matched with IoU < iou_threshold count
as unmatched (``sort.py:188-192``); a track reports only when
``time_since_update < 1`` and (``hit_streak >= min_hits`` or early
frames) (``sort.py:245-248``); tracks die after ``max_age`` misses.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tao_amodal_tpu.ops import kalman
from tao_amodal_tpu.ops.hungarian import (
    NEG,
    auction_assign,
    greedy_assign,
)


class SortState(NamedTuple):
    x: jax.Array            # [K, 7] Kalman means
    P: jax.Array            # [K, 7, 7] covariances
    alive: jax.Array        # [K] bool
    track_id: jax.Array     # [K] int32 (global ids, 1-based)
    hits: jax.Array         # [K] int32
    hit_streak: jax.Array   # [K] int32
    age: jax.Array          # [K] int32
    time_since_update: jax.Array  # [K] int32
    next_id: jax.Array      # [] int32
    frame_count: jax.Array  # [] int32


def init_sort(max_tracks=128, dtype=jnp.float32):
    K = max_tracks
    return SortState(
        x=jnp.zeros((K, kalman.DIM_X), dtype),
        P=jnp.zeros((K, kalman.DIM_X, kalman.DIM_X), dtype),
        alive=jnp.zeros((K,), bool),
        track_id=jnp.zeros((K,), jnp.int32),
        hits=jnp.zeros((K,), jnp.int32),
        hit_streak=jnp.zeros((K,), jnp.int32),
        age=jnp.zeros((K,), jnp.int32),
        time_since_update=jnp.zeros((K,), jnp.int32),
        next_id=jnp.ones((), jnp.int32),
        frame_count=jnp.zeros((), jnp.int32),
    )


def _iou_matrix(dets, trks):
    x0 = jnp.maximum(dets[:, None, 0], trks[None, :, 0])
    y0 = jnp.maximum(dets[:, None, 1], trks[None, :, 1])
    x1 = jnp.minimum(dets[:, None, 2], trks[None, :, 2])
    y1 = jnp.minimum(dets[:, None, 3], trks[None, :, 3])
    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    a = ((dets[:, 2] - dets[:, 0])
         * (dets[:, 3] - dets[:, 1]))[:, None]
    b = ((trks[:, 2] - trks[:, 0])
         * (trks[:, 3] - trks[:, 1]))[None, :]
    union = a + b - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0),
                     0.0)


@partial(jax.jit, static_argnames=("max_age", "min_hits",
                                   "assignment"))
def sort_step(state: SortState, det_boxes, det_valid, max_age=1,
              min_hits=3, iou_threshold=0.3, assignment="auction"):
    """One frame of SORT.

    Args:
      state: current :class:`SortState`.
      det_boxes: ``[D, 4]`` xyxy detections (padded).
      det_valid: ``[D]`` bool.
      assignment: 'auction' (Hungarian-equivalent within eps, the
        reference's optimal-assignment semantics) or 'greedy'
        (parallel mutual-best greedy — a handful of dense rounds
        instead of the auction's bidding loop; the flagship pipeline
        uses this for latency, see BENCH_NOTES).

    Returns:
      (new_state, out) where out has per-detection track ids
      (``[D]`` int32, 0 where no track reported — mirroring
      ``SortWithDetectionId`` which returns the matched detection's
      row) and per-slot reporting masks.
    """
    K = state.x.shape[0]
    D = det_boxes.shape[0]
    frame_count = state.frame_count + 1

    # Predict all alive slots.
    x_pred, P_pred = kalman.predict(state.x, state.P)
    x_pred = jnp.where(state.alive[:, None], x_pred, state.x)
    P_pred = jnp.where(state.alive[:, None, None], P_pred, state.P)
    trk_boxes = kalman.state_to_bbox(x_pred)
    age = jnp.where(state.alive, state.age + 1, state.age)
    tsu = jnp.where(state.alive, state.time_since_update + 1,
                    state.time_since_update)
    hit_streak = jnp.where(state.time_since_update > 0,
                           jnp.zeros_like(state.hit_streak),
                           state.hit_streak)

    # Association: maximize IoU, forbid invalid pairs.  The auction is
    # eps-approximate (eps=5e-5): two IoU payoffs closer than eps can
    # pick a different pairing than exact Hungarian.  For bit-exact
    # parity with the reference's scipy/lap path, associate on host with
    # ops.hungarian.linear_assignment_host instead (the host SORT test
    # oracle does exactly that).
    iou = _iou_matrix(det_boxes, trk_boxes)
    benefit = jnp.where(det_valid[:, None] & state.alive[None, :], iou,
                        NEG)
    if assignment == "greedy":
        row_to_col = greedy_assign(benefit)
    elif assignment == "gated_auction":
        # Auction tuned to the SORT gate: matches below iou_threshold
        # are discarded anyway, so contested losers may retire once
        # their best net value drops under the gate (a handful of
        # rounds) instead of price-warring down to -1e-3 at eps
        # granularity (thousands of rounds).  Within-gate assignments
        # are Hungarian-optimal within n*eps.
        row_to_col = auction_assign(benefit, eps=1e-3,
                                    floor=0.8 * iou_threshold)
    else:
        row_to_col = auction_assign(benefit)
    matched_det = row_to_col >= 0
    col = jnp.maximum(row_to_col, 0)
    good = matched_det & (iou[jnp.arange(D), col] >= iou_threshold)

    # Scatter matched measurements into slot order.
    det_for_slot = jnp.full((K,), -1, jnp.int32)
    det_for_slot = det_for_slot.at[
        jnp.where(good, col, K)].set(
            jnp.where(good, jnp.arange(D, dtype=jnp.int32), -1),
            mode="drop")
    slot_matched = det_for_slot >= 0
    z = kalman.bbox_to_z(det_boxes[jnp.maximum(det_for_slot, 0)])
    x_new, P_new = kalman.update(x_pred, P_pred, z, gate=slot_matched)

    hits = jnp.where(slot_matched, state.hits + 1, state.hits)
    hit_streak = jnp.where(slot_matched, hit_streak + 1, hit_streak)
    tsu = jnp.where(slot_matched, 0, tsu)

    # Death: too long without update.
    alive = state.alive & (tsu <= max_age)

    # Birth: unmatched valid detections claim free slots.
    unmatched = det_valid & ~good
    free = ~alive
    # Rank free slots and unmatched dets; det i takes the i-th free slot.
    free_rank = jnp.cumsum(free) - 1          # [K] rank among free
    det_rank = jnp.cumsum(unmatched) - 1      # [D]
    n_free = jnp.sum(free)
    can_spawn = unmatched & (det_rank < n_free)
    # slot index for each spawning det: position of free slot with
    # rank == det_rank.
    slot_of_rank = jnp.full((K,), K, jnp.int32).at[
        jnp.where(free, free_rank, K)].set(
            jnp.arange(K, dtype=jnp.int32), mode="drop")
    spawn_slot = slot_of_rank[jnp.minimum(det_rank, K - 1)]
    spawn_slot = jnp.where(can_spawn, spawn_slot, K)

    x_init, P_init = kalman.init_state(det_boxes)
    x_new = x_new.at[spawn_slot].set(
        jnp.where(can_spawn[:, None], x_init, 0.0), mode="drop")
    P_new = P_new.at[spawn_slot].set(
        jnp.where(can_spawn[:, None, None], P_init, 0.0), mode="drop")

    new_ids = state.next_id + det_rank.astype(jnp.int32)
    track_id = state.track_id.at[spawn_slot].set(
        jnp.where(can_spawn, new_ids, 0), mode="drop")
    zero = jnp.zeros((), jnp.int32)
    hits = hits.at[spawn_slot].set(jnp.where(can_spawn, 1, 0),
                                   mode="drop")
    hit_streak = hit_streak.at[spawn_slot].set(
        jnp.where(can_spawn, 1, 0), mode="drop")
    age = age.at[spawn_slot].set(jnp.where(can_spawn, zero, zero),
                                 mode="drop")
    tsu = tsu.at[spawn_slot].set(jnp.where(can_spawn, zero, zero),
                                 mode="drop")
    alive = alive.at[spawn_slot].set(
        jnp.where(can_spawn, True, False), mode="drop")
    next_id = state.next_id + jnp.sum(can_spawn).astype(jnp.int32)

    # Reporting rule (``sort.py:245-248``).
    report = alive & (tsu < 1) & (
        (hit_streak >= min_hits) | (frame_count <= min_hits))

    # Per-detection track id output (SortWithDetectionId capability).
    det_slot = jnp.where(good, col, 0)
    det_track_id = jnp.where(good, track_id[det_slot], 0)
    det_track_id = jnp.where(
        can_spawn, track_id[jnp.minimum(spawn_slot, K - 1)],
        det_track_id)
    det_report = jnp.zeros((D,), bool)
    det_report = jnp.where(good, report[det_slot], det_report)
    det_report = jnp.where(
        can_spawn, report[jnp.minimum(spawn_slot, K - 1)], det_report)

    new_state = SortState(x=x_new, P=P_new, alive=alive,
                          track_id=track_id, hits=hits,
                          hit_streak=hit_streak, age=age,
                          time_since_update=tsu, next_id=next_id,
                          frame_count=frame_count)
    out = {
        "slot_boxes": kalman.state_to_bbox(x_new),
        "slot_report": report,
        "slot_track_id": track_id,
        "det_track_id": det_track_id,
        "det_report": det_report,
    }
    return new_state, out


class Sort:
    """Stateful convenience wrapper (host API like reference ``Sort``)."""

    def __init__(self, max_age=1, min_hits=3, iou_threshold=0.3,
                 max_tracks=128, max_dets=64):
        self.max_age = max_age
        self.min_hits = min_hits
        self.iou_threshold = iou_threshold
        self.max_dets = max_dets
        self.state = init_sort(max_tracks)

    def update(self, dets):
        """dets: ``[N, 5]`` (x1, y1, x2, y2, score) numpy.

        Returns ``[M, 5]`` (x1, y1, x2, y2, track_id) like the
        reference ``Sort.update`` (``sort.py:222-262``).
        """
        import numpy as np

        dets = np.asarray(dets, np.float32).reshape(-1, 5)
        D = self.max_dets
        boxes = np.zeros((D, 4), np.float32)
        valid = np.zeros((D,), bool)
        n = min(len(dets), D)
        boxes[:n] = dets[:n, :4]
        valid[:n] = True
        self.state, out = sort_step(
            self.state, jnp.asarray(boxes), jnp.asarray(valid),
            max_age=self.max_age, min_hits=self.min_hits,
            iou_threshold=self.iou_threshold)
        rep = np.asarray(out["slot_report"])
        bx = np.asarray(out["slot_boxes"])[rep]
        ids = np.asarray(out["slot_track_id"])[rep]
        if len(bx) == 0:
            return np.empty((0, 5))
        return np.concatenate([bx, ids[:, None].astype(np.float64)],
                              axis=1)
