"""greedy_match vs a direct transcription of the protocol loop.

``_spec_match`` re-derives the matcher from the documented protocol
(reference eval.py:396-428): per threshold, per score-ordered detection,
walk gts in ignore-last order, skip matched (stored id > 0), break into
the ignore region only after a real match, keep the strict-improvement
running best.
"""

import numpy as np

from tao_amodal_tpu.ops.matching import greedy_match, greedy_match_jax


def _spec_match(ious, gt_ig, dt_ids, gt_ids, iou_thrs, unmatched):
    T = len(iou_thrs)
    D, G = ious.shape
    gt_m = np.full((T, G), unmatched, float)
    dt_m = np.full((T, D), unmatched, float)
    dt_igm = np.zeros((T, D))
    for ti, thr in enumerate(iou_thrs):
        if len(ious) == 0:
            break
        for d in range(D):
            best = min(thr, 1 - 1e-10)
            m = -1
            for g in range(G):
                if gt_m[ti, g] > 0:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[g] == 1:
                    break
                if ious[d, g] < best:
                    continue
                best = ious[d, g]
                m = g
            if m == -1:
                continue
            dt_igm[ti, d] = gt_ig[m]
            dt_m[ti, d] = gt_ids[m]
            gt_m[ti, m] = dt_ids[d]
    return dt_m, gt_m, dt_igm


def _random_case(rng, D, G, tie_prob=0.4):
    ious = rng.rand(D, G)
    # Quantize to force exact ties frequently.
    ious = np.round(ious * 8) / 8.0
    gt_ig = (rng.rand(G) < 0.3).astype(float)
    # Matcher precondition: gts sorted ignore-last (the evaluator sorts
    # before matching, reference eval.py:371-372).
    order = np.argsort(gt_ig, kind="mergesort")
    gt_ig = gt_ig[order]
    if rng.rand() < tie_prob and D and G:
        ious[rng.randint(D), :] = 0.5
    dt_ids = np.arange(1, D + 1, dtype=float)
    gt_ids = np.arange(101, 101 + G, dtype=float)
    return ious, gt_ig, dt_ids, gt_ids


IOU_THRS = np.linspace(0.5, 0.95, 10)


def test_numpy_matches_spec_random():
    rng = np.random.RandomState(7)
    for _ in range(60):
        D, G = rng.randint(0, 9), rng.randint(0, 7)
        ious, gt_ig, dt_ids, gt_ids = _random_case(rng, D, G)
        for unmatched in (-1.0, 0.0):
            exp = _spec_match(ious, gt_ig, dt_ids, gt_ids, IOU_THRS,
                              unmatched)
            got = greedy_match(ious, gt_ig, dt_ids, gt_ids, IOU_THRS,
                               unmatched=unmatched)
            for e, g in zip(exp, got):
                np.testing.assert_array_equal(e, g)


def test_numpy_matches_spec_adversarial_ids():
    """Fuzz with hostile id values (0, negative, duplicates) and a bias
    toward single-gt cells: every hand-optimized fast path in
    greedy_match (the single-gt first-clearing path guards on
    ``dt_ids.min() > 0``) must fall back to spec behavior whenever its
    precondition fails — id 0 re-enables gt stealing via the reference's
    ``stored id > 0`` matched test, so the fast path may only run when
    no dt id can store a non-positive value."""
    rng = np.random.RandomState(21)
    for case in range(120):
        # Bias toward the single-gt fast path (G == 1) half the time.
        G = 1 if case % 2 else rng.randint(0, 5)
        D = rng.randint(0, 9)
        ious, gt_ig, dt_ids, gt_ids = _random_case(rng, D, G)
        if D:
            # Sprinkle adversarial ids: zeros, negatives, duplicates.
            k = rng.randint(0, D + 1)
            idx = rng.choice(D, size=k, replace=False)
            dt_ids[idx] = rng.choice(
                [0.0, -1.0, -7.0, 0.5, 2.0], size=k)
        if G:
            gt_ids[rng.rand(G) < 0.3] = rng.choice([0.0, -3.0, 11.0])
        for unmatched in (-1.0, 0.0):
            exp = _spec_match(ious, gt_ig, dt_ids, gt_ids, IOU_THRS,
                              unmatched)
            got = greedy_match(ious, gt_ig, dt_ids, gt_ids, IOU_THRS,
                               unmatched=unmatched)
            for e, g in zip(exp, got):
                np.testing.assert_array_equal(
                    e, g, err_msg=f"case={case} D={D} G={G} "
                                  f"dt_ids={dt_ids} gt_ids={gt_ids}")


def test_id_zero_quirk():
    """A dt with id 0 must not block its matched gt (the > 0 test)."""
    ious = np.array([[0.9], [0.8]])
    gt_ig = np.array([0.0])
    dt_ids = np.array([0.0, 2.0])  # first dt has id 0
    gt_ids = np.array([5.0])
    thrs = np.array([0.5])
    exp = _spec_match(ious, gt_ig, dt_ids, gt_ids, thrs, -1.0)
    got = greedy_match(ious, gt_ig, dt_ids, gt_ids, thrs, unmatched=-1.0)
    for e, g in zip(exp, got):
        np.testing.assert_array_equal(e, g)
    # Both detections match the single gt: the second steals it because
    # the stored id 0 fails the > 0 "already matched" test.
    assert got[0][0, 0] == 5.0 and got[0][0, 1] == 5.0


def test_ignored_gt_fallback():
    """dt falls back to an ignored gt only when no real gt qualifies."""
    ious = np.array([[0.6, 0.9]])
    gt_ig = np.array([0.0, 1.0])  # second gt ignored (already sorted last)
    got = greedy_match(ious, gt_ig, [1.0], [10.0, 20.0], [0.5],
                       unmatched=-1.0)
    # real gt (iou .6) wins over higher-iou ignored gt
    assert got[0][0, 0] == 10.0
    assert got[2][0, 0] == 0.0


def test_jax_matches_numpy_with_padding():
    rng = np.random.RandomState(9)
    for _ in range(20):
        D, G = rng.randint(1, 7), rng.randint(1, 6)
        ious, gt_ig, dt_ids, gt_ids = _random_case(rng, D, G)
        exp = greedy_match(ious, gt_ig, dt_ids, gt_ids, IOU_THRS,
                           unmatched=-1.0)
        # Pad to (8, 8).
        ious_p = np.zeros((8, 8), np.float32)
        ious_p[:D, :G] = ious
        gt_ig_p = np.zeros(8, np.float32)
        gt_ig_p[:G] = gt_ig
        dt_ids_p = np.zeros(8, np.float32)
        dt_ids_p[:D] = dt_ids
        gt_ids_p = np.zeros(8, np.float32)
        gt_ids_p[:G] = gt_ids
        dt_v = np.arange(8) < D
        gt_v = np.arange(8) < G
        got = greedy_match_jax(ious_p, gt_ig_p, dt_ids_p, gt_ids_p,
                               IOU_THRS, dt_valid=dt_v, gt_valid=gt_v,
                               unmatched=-1.0)
        got = [np.asarray(x) for x in got]
        np.testing.assert_allclose(got[0][:, :D], exp[0], atol=1e-6)
        np.testing.assert_allclose(got[1][:, :G], exp[1], atol=1e-6)
        np.testing.assert_allclose(got[2][:, :D], exp[2], atol=1e-6)
