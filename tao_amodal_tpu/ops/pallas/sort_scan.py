"""Whole-clip SORT association as ONE Pallas TPU kernel.

The flagship pipeline's SORT block is a ``lax.scan`` of
:func:`tao_amodal_tpu.trackers.sort.sort_step` over frames — inherently
sequential, and (measured, BENCH_NOTES round-2/5 dissections) its cost
is not FLOPs but the exposed latency of ~30 tiny dependent XLA ops per
frame (Kalman 7-dim einsums, a 64x128 IoU, the greedy fixpoint, masked
lifecycle math), none big enough to hide the next one's issue overhead.
This kernel runs the ENTIRE clip scan inside one ``pallas_call``: state
lives in registers/VMEM across frames, every per-frame op is a handful
of VPU vector ops on ``[1, K]`` rows / ``[D, K]`` tiles, and the only
HBM traffic is detections in, (ids, report) out.

MEASURED VERDICT (round 5, BENCH_NOTES): the hypothesis is wrong at
the production shape — on-chip the kernel runs 0.204 ms/clip vs the
XLA scan's 0.183 (T=16, D=64, K=128), because XLA's unroll-16 scan
already overlaps the per-frame op chain about as well as the kernel's
in-register loop does, and the kernel's scatter-free re-expressions
(triangular-matmul ranks, one-hot contractions) cost more VPU work
than the scatters they replace.  Kept as an explicit opt-in
(``impl='pallas'``) with full interpret-mode parity tests; ``auto``
resolves to the XLA scan.

Capability mirror of the reference's per-frame host tracker
(``visualization/tao/third_party/sort/sort.py:198-256``), with the same
slot-bank semantics as ``trackers/sort.py::sort_step`` (greedy
assignment): the parity test drives both over random multi-frame
scenes and requires identical integer outputs.

Layout choices (TPU vector unit is 8x128 lanes):
  - slot axis K=128 on LANES: every per-slot quantity (Kalman state
    dims, covariance entries, lifecycle counters) is a ``[1, K]`` row
    = one vreg; the 7x7 covariance is 49 rows updated by unrolled
    row arithmetic that exploits F's constant-velocity sparsity.
  - det axis D on SUBLANES: det quantities are ``[D, 1]`` columns, so
    the IoU / assignment / birth-matching matrices are natural
    ``[D, K]`` broadcasts.
  - NO scatters/gathers: every ``x.at[idx].set`` of the XLA step is
    re-expressed as a one-hot ``[D, K]`` mask contraction (mutual-best
    pairs, matched-measurement scatter, rank-matched birth slots), and
    ranks come from triangular-mask matmuls instead of cumsum.

Float caveat: covariance updates here are unrolled row sums, XLA's are
einsums — f32 rounding can differ in the last ulp, so outputs are
behaviorally (not bit-) identical; integer outputs only differ if an
IoU near-tie flips the argmax (the parity test quantifies: zero flips
over its random scenes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tao_amodal_tpu.ops.hungarian import NEG
from tao_amodal_tpu.trackers.sort import SortState, sort_step

_F32 = jnp.float32


def _iota(shape, dim):
    # Mosaic's tpu.iota only produces integer vectors; cast to f32 for
    # the rank/benefit arithmetic (exact for the small ranges here).
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(_F32)


def _any_rows(m):
    """[D, K] -> [1, K] max over sublanes."""
    return jnp.max(m, axis=0, keepdims=True)


def _any_cols(m):
    """[D, K] -> [D, 1] max over lanes."""
    return jnp.max(m, axis=1, keepdims=True)


def _greedy_rounds(b, r2c, D, K):
    """One mutual-best greedy round on benefit ``b [D, K]``.

    Matrix-form equivalent of ``ops/hungarian.py::greedy_assign``'s
    body: (row argmax, col argmax) computed as first-max-index via
    iota-min (matching ``jnp.argmax`` first-occurrence tie-breaking),
    the mutual-pair set as an outer AND, and the scatter-free column
    retirement as a broadcast mask.  Idempotent once no benefit
    exceeds ``NEG/2`` — extra rounds are exact no-ops.
    """
    iota_k = _iota((D, K), 1)
    iota_d = _iota((D, K), 0)
    rowmax = _any_cols(b)                                     # [D,1]
    bestcol = jnp.min(jnp.where(b == rowmax, iota_k, float(K)),
                      axis=1, keepdims=True)                  # [D,1]
    colmax = _any_rows(b)                                     # [1,K]
    bestrow = jnp.min(jnp.where(b == colmax, iota_d, float(D)),
                      axis=0, keepdims=True)                  # [1,K]
    mutual_pair = ((iota_k == bestcol) & (iota_d == bestrow)
                   & (b > NEG / 2))                           # [D,K]
    mutual_d = _any_cols(mutual_pair.astype(_F32)) > 0.5      # [D,1]
    taken_k = _any_rows(mutual_pair.astype(_F32)) > 0.5       # [1,K]
    r2c = jnp.where(mutual_d, bestcol, r2c)
    b = jnp.where(mutual_d | taken_k, NEG, b)
    return b, r2c


def _inv4x4_rows(S):
    """Closed-form 4x4 inverse on ``[1, K]`` rows — the exact formula
    of ``ops/kalman.py::_inv4x4`` with each matrix entry a row."""
    (a, b, c, d), (e, f, g, h), (i, j, k, l), (mm, n, o, p) = S
    s0 = a * f - e * b
    s1 = a * g - e * c
    s2 = a * h - e * d
    s3 = b * g - f * c
    s4 = b * h - f * d
    s5 = c * h - g * d
    c5 = k * p - o * l
    c4 = j * p - n * l
    c3 = j * o - n * k
    c2 = i * p - mm * l
    c1 = i * o - mm * k
    c0 = i * n - mm * j
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    rows = [
        [f * c5 - g * c4 + h * c3, -b * c5 + c * c4 - d * c3,
         n * s5 - o * s4 + p * s3, -j * s5 + k * s4 - l * s3],
        [-e * c5 + g * c2 - h * c1, a * c5 - c * c2 + d * c1,
         -mm * s5 + o * s2 - p * s1, i * s5 - k * s2 + l * s1],
        [e * c4 - f * c2 + h * c0, -a * c4 + b * c2 - d * c0,
         mm * s4 - n * s2 + p * s0, -i * s4 + j * s2 - l * s0],
        [-e * c3 + f * c1 - g * c0, a * c3 - b * c1 + c * c0,
         -mm * s3 + n * s1 - o * s0, i * s3 - j * s1 + k * s0],
    ]
    return [[r * inv_det for r in row] for row in rows]


# P0 / Q / R diagonals from ops/kalman.py::_constants.
_P0_DIAG = (10.0, 10.0, 10.0, 10.0, 10000.0, 10000.0, 10000.0)
_Q_DIAG = (1.0, 1.0, 1.0, 1.0, 0.01, 0.01, 0.0001)
_R_DIAG = (1.0, 1.0, 10.0, 10.0)


def _sort_scan_kernel(det_ref, x0_ref, p0_ref, meta0_ref,
                      xo_ref, po_ref, metao_ref, ids_ref, rep_ref,
                      *, T, D, K, max_age, min_hits, iou_threshold,
                      unrolled_rounds):
    lane0 = _iota((1, K), 1) == 0

    def scalar_of(row):
        return jnp.sum(jnp.where(lane0, row, 0.0))

    x_rows = tuple(x0_ref[i:i + 1, :] for i in range(7))
    P_rows = tuple(p0_ref[r:r + 1, :] for r in range(49))
    alive = meta0_ref[0:1, :]
    tid = meta0_ref[1:2, :]
    hits = meta0_ref[2:3, :]
    streak = meta0_ref[3:4, :]
    age = meta0_ref[4:5, :]
    tsu = meta0_ref[5:6, :]
    nid = scalar_of(meta0_ref[6:7, :])
    fc = scalar_of(meta0_ref[7:8, :])

    def frame(t, carry):
        (x, P, alive, tid, hits, streak, age, tsu, nid, fc) = carry
        alive_b = alive > 0.5
        fc = fc + 1.0

        # --- detections of this frame: [D, 1] columns -------------
        dx0 = det_ref[t, :, 0:1]
        dy0 = det_ref[t, :, 1:2]
        dx1 = det_ref[t, :, 2:3]
        dy1 = det_ref[t, :, 3:4]
        dvalid = det_ref[t, :, 4:5] > 0.5

        # --- Kalman predict (sort_step predict block) -------------
        vs_bad = (x[6] + x[2]) <= 0
        x6z = jnp.where(vs_bad, 0.0, x[6])
        xp = [x[0] + x[4], x[1] + x[5], x[2] + x6z, x[3],
              x[4], x[5], x6z]
        xp = [jnp.where(alive_b, xp[i],
                        x[i] if i != 6 else x[6]) for i in range(7)]

        def pr(i, j):
            return P[i * 7 + j]

        Pp = []
        for i in range(7):
            ci = 1 if i < 3 else 0
            for j in range(7):
                cj = 1 if j < 3 else 0
                v = pr(i, j)
                if cj:
                    v = v + pr(i, j + 4)
                if ci:
                    v = v + pr(i + 4, j)
                if ci and cj:
                    v = v + pr(i + 4, j + 4)
                if i == j:
                    v = v + _Q_DIAG[i]
                Pp.append(jnp.where(alive_b, v, pr(i, j)))

        # predicted track boxes (state_to_bbox)
        tw = jnp.sqrt(jnp.maximum(xp[2] * xp[3], 0.0))
        th = xp[2] / jnp.maximum(tw, 1e-6)
        tx0 = xp[0] - tw / 2
        ty0 = xp[1] - th / 2
        tx1 = xp[0] + tw / 2
        ty1 = xp[1] + th / 2

        age = jnp.where(alive_b, age + 1, age)
        streak = jnp.where(tsu > 0, 0.0, streak)
        tsu = jnp.where(alive_b, tsu + 1, tsu)

        # --- IoU + greedy association ------------------------------
        ix0 = jnp.maximum(dx0, tx0)
        iy0 = jnp.maximum(dy0, ty0)
        ix1 = jnp.minimum(dx1, tx1)
        iy1 = jnp.minimum(dy1, ty1)
        inter = (jnp.maximum(ix1 - ix0, 0.0)
                 * jnp.maximum(iy1 - iy0, 0.0))
        area_d = (dx1 - dx0) * (dy1 - dy0)
        area_t = (tx1 - tx0) * (ty1 - ty0)
        union = area_d + area_t - inter
        iou = jnp.where(union > 0,
                        inter / jnp.where(union > 0, union, 1.0), 0.0)
        b = jnp.where(dvalid & alive_b, iou, NEG)
        b = jnp.where(b > NEG / 2, b, NEG)

        r2c = jnp.full((D, 1), -1.0, _F32)
        for _ in range(unrolled_rounds):
            b, r2c = _greedy_rounds(b, r2c, D, K)

        def g_cond(c):
            bb, _, it = c
            return jnp.any(bb > NEG / 2) & (it < D)

        def g_body(c):
            bb, rr, it = c
            bb, rr = _greedy_rounds(bb, rr, D, K)
            return bb, rr, it + 1

        _, r2c, _ = jax.lax.while_loop(
            g_cond, g_body,
            (b, r2c, jnp.asarray(unrolled_rounds, jnp.int32)))

        matched = r2c >= 0
        col = jnp.maximum(r2c, 0.0)
        sel = _iota((D, K), 1) == col                        # [D,K]
        iou_at = _any_cols(jnp.where(sel, iou, 0.0))          # [D,1]
        good = matched & (iou_at >= iou_threshold)
        onehot = jnp.where(good & sel, 1.0, 0.0)              # [D,K]
        slot_m = _any_rows(onehot) > 0.5                      # [1,K]

        # --- Kalman update on matched slots ------------------------
        dw = dx1 - dx0
        dh = dy1 - dy0
        zc = [dx0 + dw / 2, dy0 + dh / 2, dw * dh,
              dw / jnp.maximum(dh, 1e-6)]                     # [D,1] x4
        z = [jnp.sum(onehot * zc[j], axis=0, keepdims=True)
             for j in range(4)]                               # [1,K] x4
        y = [z[j] - xp[j] for j in range(4)]
        S = [[Pp[i * 7 + j] + (_R_DIAG[i] if i == j else 0.0)
              for j in range(4)] for i in range(4)]
        Sinv = _inv4x4_rows(S)
        Kg = [[sum(Pp[i * 7 + a] * Sinv[a][j] for a in range(4))
               for j in range(4)] for i in range(7)]
        xn = [xp[i] + sum(Kg[i][j] * y[j] for j in range(4))
              for i in range(7)]
        Pn = [Pp[i * 7 + j]
              - sum(Kg[i][a] * Pp[a * 7 + j] for a in range(4))
              for i in range(7) for j in range(7)]
        xn = [jnp.where(slot_m, xn[i], xp[i]) for i in range(7)]
        Pn = [jnp.where(slot_m, Pn[r], Pp[r]) for r in range(49)]

        hits = jnp.where(slot_m, hits + 1, hits)
        streak = jnp.where(slot_m, streak + 1, streak)
        tsu = jnp.where(slot_m, 0.0, tsu)
        alive_b = alive_b & (tsu <= max_age)

        # --- births: rank-matched free slots -----------------------
        unmatched = (dvalid & ~good).astype(_F32)             # [D,1]
        free = (~alive_b).astype(_F32)                        # [1,K]
        # ranks via triangular matmuls (cumsum-1)
        lt_k = (_iota((K, K), 0) <= _iota((K, K), 1)).astype(_F32)
        fr = jnp.dot(free, lt_k,
                     preferred_element_type=_F32) - 1.0       # [1,K]
        lt_d = (_iota((D, D), 1) <= _iota((D, D), 0)).astype(_F32)
        dr = jnp.dot(lt_d, unmatched,
                     preferred_element_type=_F32) - 1.0       # [D,1]
        n_free = jnp.sum(free)
        can_spawn = (unmatched > 0.5) & (dr < n_free)         # [D,1]
        spawn_pair = jnp.where(
            can_spawn & (free > 0.5) & (dr == fr), 1.0, 0.0)  # [D,K]
        ssb = _any_rows(spawn_pair) > 0.5                     # [1,K]

        zs = [jnp.sum(spawn_pair * zc[j], axis=0, keepdims=True)
              for j in range(4)]
        xn = [jnp.where(ssb, zs[i] if i < 4 else 0.0, xn[i])
              for i in range(7)]
        Pn = [jnp.where(ssb,
                        _P0_DIAG[r // 7] if r // 7 == r % 7 else 0.0,
                        Pn[r]) for r in range(49)]

        new_id = nid + dr                                     # [D,1]
        id_slot = jnp.sum(spawn_pair * new_id, axis=0,
                          keepdims=True)
        tid = jnp.where(ssb, id_slot, tid)
        hits = jnp.where(ssb, 1.0, hits)
        streak = jnp.where(ssb, 1.0, streak)
        age = jnp.where(ssb, 0.0, age)
        tsu = jnp.where(ssb, 0.0, tsu)
        alive_b = alive_b | ssb
        nid = nid + jnp.sum(jnp.where(can_spawn, 1.0, 0.0))

        # --- reporting + per-det outputs ---------------------------
        report = (alive_b & (tsu < 1)
                  & ((streak >= min_hits) | (fc <= min_hits)))
        rep_f = report.astype(_F32)
        det_tid = _any_cols(onehot * tid)                     # [D,1]
        det_tid = jnp.where(can_spawn, new_id, det_tid)
        det_rep = _any_cols(onehot * rep_f)
        det_rep = jnp.where(can_spawn,
                            _any_cols(spawn_pair * rep_f), det_rep)

        ids_ref[t] = det_tid
        rep_ref[t] = det_rep
        return (tuple(xn), tuple(Pn), alive_b.astype(_F32), tid,
                hits, streak, age, tsu, nid, fc)

    carry = (x_rows, P_rows, alive, tid, hits, streak, age, tsu,
             nid, fc)
    (x_rows, P_rows, alive, tid, hits, streak, age, tsu, nid,
     fc) = jax.lax.fori_loop(0, T, frame, carry)

    for i in range(7):
        xo_ref[i:i + 1, :] = x_rows[i]
    xo_ref[7:8, :] = jnp.zeros((1, K), _F32)
    for r in range(49):
        po_ref[r:r + 1, :] = P_rows[r]
    for r in range(49, 56):
        po_ref[r:r + 1, :] = jnp.zeros((1, K), _F32)
    metao_ref[0:1, :] = alive
    metao_ref[1:2, :] = tid
    metao_ref[2:3, :] = hits
    metao_ref[3:4, :] = streak
    metao_ref[4:5, :] = age
    metao_ref[5:6, :] = tsu
    metao_ref[6:7, :] = jnp.full((1, K), nid)
    metao_ref[7:8, :] = jnp.full((1, K), fc)


@partial(jax.jit, static_argnames=("max_age", "min_hits",
                                   "iou_threshold", "interpret"))
def sort_scan_pallas(state: SortState, boxes, valid, *, max_age=1,
                     min_hits=3, iou_threshold=0.3, interpret=False):
    """Run the whole-clip greedy SORT scan in one Pallas kernel.

    Args:
      state: :class:`SortState` (K slots).
      boxes: ``[T, D, 4]`` xyxy per-frame detections (padded).
      valid: ``[T, D]`` bool.

    Returns ``(new_state, (det_track_id [T, D] int32,
    det_report [T, D] bool))`` — the exact pair the pipeline's
    association scan carries.
    """
    T, D = boxes.shape[0], boxes.shape[1]
    K = state.x.shape[0]
    Dp = -(-max(D, 8) // 8) * 8

    det = jnp.zeros((T, Dp, 8), _F32)
    det = det.at[:, :D, 0:4].set(boxes.astype(_F32))
    det = det.at[:, :D, 4].set(valid.astype(_F32))

    x0 = jnp.zeros((8, K), _F32).at[:7].set(state.x.T.astype(_F32))
    p0 = jnp.zeros((56, K), _F32).at[:49].set(
        state.P.astype(_F32).transpose(1, 2, 0).reshape(49, K))
    meta = jnp.stack([
        state.alive.astype(_F32),
        state.track_id.astype(_F32),
        state.hits.astype(_F32),
        state.hit_streak.astype(_F32),
        state.age.astype(_F32),
        state.time_since_update.astype(_F32),
        jnp.full((K,), state.next_id, _F32),
        jnp.full((K,), state.frame_count, _F32),
    ])

    kernel = partial(_sort_scan_kernel, T=T, D=Dp, K=K,
                     max_age=float(max_age), min_hits=float(min_hits),
                     iou_threshold=float(iou_threshold),
                     unrolled_rounds=4)
    xo, po, metao, ids, rep = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((8, K), _F32),
            jax.ShapeDtypeStruct((56, K), _F32),
            jax.ShapeDtypeStruct((8, K), _F32),
            jax.ShapeDtypeStruct((T, Dp, 1), _F32),
            jax.ShapeDtypeStruct((T, Dp, 1), _F32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        interpret=interpret,
    )(det, x0, p0, meta)

    lane0 = jnp.zeros((K,), _F32).at[0].set(1.0)
    new_state = SortState(
        x=xo[:7].T.astype(state.x.dtype),
        P=po[:49].reshape(7, 7, K).transpose(2, 0, 1).astype(
            state.P.dtype),
        alive=metao[0] > 0.5,
        track_id=metao[1].astype(jnp.int32),
        hits=metao[2].astype(jnp.int32),
        hit_streak=metao[3].astype(jnp.int32),
        age=metao[4].astype(jnp.int32),
        time_since_update=metao[5].astype(jnp.int32),
        next_id=jnp.sum(metao[6] * lane0).astype(jnp.int32),
        frame_count=jnp.sum(metao[7] * lane0).astype(jnp.int32),
    )
    ids_out = ids[:, :D, 0].astype(jnp.int32)
    rep_out = rep[:, :D, 0] > 0.5
    return new_state, (ids_out, rep_out)


def sort_scan(state: SortState, boxes, valid, *, max_age=1,
              min_hits=3, iou_threshold=0.3, assignment="greedy",
              impl="auto", unroll=16):
    """Clip-level SORT association: Pallas kernel or XLA scan.

    ``impl='auto'`` resolves to the XLA ``lax.scan``: the on-chip A/B
    (``experiments/sort_scan_kernel_bench.py``, BENCH_NOTES round-5)
    measured the Pallas whole-scan kernel at 0.204 ms/clip vs the XLA
    scan's 0.183 at the production shape (T=16, D=64, K=128) — XLA's
    unroll-16 scan already pipelines the tiny per-frame ops well
    enough that moving the loop into one kernel buys nothing.  The
    kernel is kept as an explicit ``impl='pallas'`` opt-in: it is
    bit-exact with its interpret mode on-chip (divergence study in
    ``experiments/sort_scan_divergence.py`` — compiled==interpret with
    state delta 0.0; kernel-vs-XLA integer diffs on tie-rich random
    scenes are f32 accumulation-order argmax flips, zero on the
    parity tests' coherent-motion scenes) and is the starting point if
    the block ever dominates (e.g. much longer clips or wider D).
    """
    use_pallas = impl == "pallas"
    if use_pallas:
        return sort_scan_pallas(state, boxes, valid, max_age=max_age,
                                min_hits=min_hits,
                                iou_threshold=iou_threshold)

    def assoc(st, frame):
        bx, vl = frame
        st, out = sort_step(st, bx, vl, max_age=max_age,
                            min_hits=min_hits,
                            iou_threshold=iou_threshold,
                            assignment=assignment)
        return st, (out["det_track_id"], out["det_report"])

    return jax.lax.scan(assoc, state, (boxes, valid), unroll=unroll)
