"""SORT + assignment tests.

Spec oracle = a direct host-side transcription of the reference SORT
semantics (sort.py:204-262) over simple synthetic motion, plus
auction-vs-scipy assignment equivalence.
"""

import numpy as np
import jax.numpy as jnp

from tao_amodal_tpu.ops.hungarian import (
    NEG,
    auction_assign,
    linear_assignment_host,
)
from tao_amodal_tpu.ops import kalman
from tao_amodal_tpu.trackers.sort import Sort


def test_auction_matches_hungarian():
    rng = np.random.RandomState(0)
    for _ in range(20):
        n, m = rng.randint(1, 9), rng.randint(1, 9)
        benefit = np.round(rng.rand(n, m), 3)
        # Pad to a fixed (8, 8) shape (single jit compile) with
        # forbidden entries.
        padded = np.full((8, 8), NEG, np.float32)
        padded[:n, :m] = benefit
        got = np.asarray(auction_assign(jnp.asarray(padded)))[:n]
        pairs = linear_assignment_host(-benefit)
        exp_total = sum(benefit[r, c] for r, c in pairs)
        got_total = sum(benefit[i, c] for i, c in enumerate(got)
                        if c >= 0)
        # Auction is eps-optimal; with eps well under the 1e-3 payoff
        # quantization the optimal total is attained.
        assert abs(got_total - exp_total) < 5e-4, (benefit, got, pairs)
        # One-to-one.
        assigned = [c for c in got if c >= 0]
        assert len(assigned) == len(set(assigned))


def test_auction_respects_forbidden():
    benefit = np.full((2, 2), NEG, np.float32)
    benefit[0, 1] = 0.9
    got = np.asarray(auction_assign(jnp.asarray(benefit)))
    assert got[0] == 1 and got[1] == -1


def test_kalman_static_box_converges():
    box = jnp.asarray([[10.0, 20.0, 50.0, 60.0]])
    x, P = kalman.init_state(box)
    for _ in range(8):
        x, P = kalman.predict(x, P)
        x, P = kalman.update(x, P, kalman.bbox_to_z(box))
    out = np.asarray(kalman.state_to_bbox(x))[0]
    np.testing.assert_allclose(out, [10, 20, 50, 60], atol=0.5)


def test_sort_tracks_two_objects():
    tracker = Sort(max_age=2, min_hits=2, max_tracks=16, max_dets=8)
    ids_a, ids_b = [], []
    for t in range(8):
        dets = np.array([
            [10 + 3 * t, 10, 30 + 3 * t, 30, 0.9],
            [100, 50 + 4 * t, 120, 70 + 4 * t, 0.8],
        ])
        out = tracker.update(dets)
        if t >= 1:  # min_hits=2 reached
            assert out.shape[0] == 2, (t, out)
            order = np.argsort(out[:, 0])
            ids_a.append(out[order[0], 4])
            ids_b.append(out[order[1], 4])
    # Identity preserved across the clip.
    assert len(set(ids_a)) == 1
    assert len(set(ids_b)) == 1
    assert ids_a[0] != ids_b[0]


def test_sort_track_death_and_rebirth():
    tracker = Sort(max_age=1, min_hits=1, max_tracks=8, max_dets=4)
    det = np.array([[10.0, 10, 30, 30, 0.9]])
    out1 = tracker.update(det)
    assert out1.shape[0] == 1
    first_id = out1[0, 4]
    # Two empty frames -> death (max_age=1).
    tracker.update(np.empty((0, 5)))
    tracker.update(np.empty((0, 5)))
    out2 = tracker.update(det)
    assert out2.shape[0] == 1
    assert out2[0, 4] != first_id  # new identity


def test_sort_ignores_low_iou_matches():
    tracker = Sort(max_age=3, min_hits=1, max_tracks=8, max_dets=4)
    tracker.update(np.array([[10.0, 10, 30, 30, 0.9]]))
    # A far-away detection must spawn a new track, not match.
    out = tracker.update(np.array([[200.0, 200, 230, 230, 0.9]]))
    ids = set(out[:, 4].tolist())
    assert len(ids) == len(out)
    assert out.shape[0] >= 1
