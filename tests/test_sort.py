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


def test_greedy_assign_matches_sequential_greedy():
    """Parallel mutual-best rounds == sequential global-max greedy."""
    import numpy as np
    import jax.numpy as jnp

    from tao_amodal_tpu.ops.hungarian import NEG, greedy_assign

    rs = np.random.RandomState(0)
    for trial in range(30):
        n, m = rs.randint(1, 12), rs.randint(1, 12)
        b = rs.rand(n, m)
        b[rs.rand(n, m) < 0.3] = NEG  # forbidden entries

        # Sequential greedy spec.
        bb = b.copy()
        want = np.full(n, -1, np.int64)
        while True:
            i, j = np.unravel_index(np.argmax(bb), bb.shape)
            if bb[i, j] <= NEG / 2:
                break
            want[i] = j
            bb[i, :] = NEG
            bb[:, j] = NEG
        got = np.asarray(greedy_assign(jnp.asarray(b)))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_gated_auction_matches_full_auction_on_tracking_instances():
    """The pipeline's gated auction (floor at the IoU gate, coarse eps)
    must agree with the exact auction on realistic association
    matrices: detections near their own track, occasional crossovers."""
    import numpy as np
    import jax.numpy as jnp

    from tao_amodal_tpu.ops.hungarian import NEG, auction_assign

    rs = np.random.RandomState(1)
    same = total = 0
    for _ in range(15):
        n = 12
        # Tracks on a grid; detections jittered copies (+2 clutter).
        trk = np.stack([rs.uniform(0, 400, n), rs.uniform(0, 400, n),
                        rs.uniform(30, 80, n), rs.uniform(30, 80, n)],
                       1)
        det = trk.copy()
        det[:, :2] += rs.uniform(-10, 10, (n, 2))
        det[:, 2:] *= rs.uniform(0.85, 1.15, (n, 2))

        def iou_mat(d, t):
            x0 = np.maximum(d[:, None, 0], t[None, :, 0])
            y0 = np.maximum(d[:, None, 1], t[None, :, 1])
            x1 = np.minimum(d[:, None, 0] + d[:, None, 2],
                            t[None, :, 0] + t[None, :, 2])
            y1 = np.minimum(d[:, None, 1] + d[:, None, 3],
                            t[None, :, 1] + t[None, :, 3])
            inter = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
            union = (d[:, None, 2] * d[:, None, 3]
                     + t[None, :, 2] * t[None, :, 3] - inter)
            return inter / np.maximum(union, 1e-9)

        iou = iou_mat(det, trk)
        b = jnp.asarray(np.where(iou > 0, iou, NEG))
        exact = np.asarray(auction_assign(b))
        gated = np.asarray(auction_assign(b, eps=1e-3, floor=0.24))
        for i in range(n):
            ei = exact[i] if (exact[i] >= 0
                              and iou[i, exact[i]] >= 0.3) else -1
            gi = gated[i] if (gated[i] >= 0
                              and iou[i, gated[i]] >= 0.3) else -1
            same += ei == gi
            total += 1
    assert same / total >= 0.99, same / total


def test_sort_step_greedy_mode_runs():
    import numpy as np
    import jax.numpy as jnp

    from tao_amodal_tpu.trackers.sort import init_sort, sort_step

    rs = np.random.RandomState(2)
    state = init_sort(max_tracks=16)
    boxes = jnp.asarray(rs.rand(8, 4) * 100, jnp.float32)
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + 20)
    valid = jnp.ones((8,), bool)
    for _ in range(3):
        state, out = sort_step(state, boxes, valid,
                               assignment="greedy")
    assert int(jnp.sum(state.alive)) == 8
    assert np.all(np.asarray(out["det_track_id"]) > 0)


def test_greedy_assign_long_chain_exceeds_unrolled_rounds():
    """A next-best chain longer than the unrolled round budget must
    still reach the exact greedy fixpoint (the while_loop residual):
    b[i,i] = n-i and b[i,i-1] = n-i+0.5 makes every row i prefer col
    i-1 (owned by row i-1), so exactly ONE pair resolves per round —
    chain length n = 14 > unrolled_rounds."""
    import numpy as np
    import jax.numpy as jnp

    from tao_amodal_tpu.ops.hungarian import NEG, greedy_assign

    n = 14
    b = np.full((n, n), NEG)
    for i in range(n):
        b[i, i] = n - i
        if i > 0:
            b[i, i - 1] = n - i + 0.5
    got = np.asarray(greedy_assign(jnp.asarray(b)))
    np.testing.assert_array_equal(got, np.arange(n))
    # And with unrolling disabled entirely (pure while_loop) the
    # answer is identical.
    got0 = np.asarray(greedy_assign(jnp.asarray(b),
                                    unrolled_rounds=0))
    np.testing.assert_array_equal(got0, np.arange(n))
