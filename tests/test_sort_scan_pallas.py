"""Parity: the whole-clip Pallas SORT scan vs the XLA sort_step scan.

The kernel re-expresses every scatter/gather of sort_step as one-hot
mask contractions and the Kalman einsums as unrolled row arithmetic;
these tests drive both over random multi-frame scenes (births, deaths,
occlusion-shaped dropouts, out-of-frame boxes) and require identical
integer outputs (track ids, report masks, lifecycle counters) and
matching float state to f32-accumulation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tao_amodal_tpu.ops.pallas.sort_scan import (
    sort_scan,
    sort_scan_pallas,
)
from tao_amodal_tpu.trackers.sort import init_sort


def _random_scene(seed, T=8, D=16, hw=256.0, n_obj=6, p_drop=0.25):
    """Noisy linear-motion detections with dropouts and OOF exits."""
    rng = np.random.RandomState(seed)
    cx = rng.uniform(0.1 * hw, 0.9 * hw, n_obj)
    cy = rng.uniform(0.1 * hw, 0.9 * hw, n_obj)
    w = rng.uniform(12, 60, n_obj)
    h = rng.uniform(12, 60, n_obj)
    vx = rng.uniform(-10, 10, n_obj)
    vy = rng.uniform(-10, 10, n_obj)
    boxes = np.zeros((T, D, 4), np.float32)
    valid = np.zeros((T, D), bool)
    for t in range(T):
        for i in range(n_obj):
            if rng.rand() < p_drop:
                continue
            x0 = cx[i] + vx[i] * t - w[i] / 2 + rng.randn() * 1.5
            y0 = cy[i] + vy[i] * t - h[i] / 2 + rng.randn() * 1.5
            boxes[t, i] = [x0, y0, x0 + w[i], y0 + h[i]]
            valid[t, i] = True
    return jnp.asarray(boxes), jnp.asarray(valid)


def _run_both(seed, max_age, min_hits, T=8, D=16):
    boxes, valid = _random_scene(seed, T=T, D=D)
    s0 = init_sort(max_tracks=128)
    st_ref, (ids_ref, rep_ref) = sort_scan(
        s0, boxes, valid, max_age=max_age, min_hits=min_hits,
        assignment="greedy", impl="xla")
    st_pl, (ids_pl, rep_pl) = sort_scan_pallas(
        s0, boxes, valid, max_age=max_age, min_hits=min_hits,
        interpret=True)
    return (st_ref, ids_ref, rep_ref), (st_pl, ids_pl, rep_pl)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("max_age,min_hits", [(1, 3), (5, 1)])
def test_scan_parity_random_scenes(seed, max_age, min_hits):
    (st_r, ids_r, rep_r), (st_p, ids_p, rep_p) = _run_both(
        seed, max_age, min_hits)
    np.testing.assert_array_equal(np.asarray(ids_r), np.asarray(ids_p))
    np.testing.assert_array_equal(np.asarray(rep_r), np.asarray(rep_p))
    for f in ("alive", "track_id", "hits", "hit_streak", "age",
              "time_since_update"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_r, f)), np.asarray(getattr(st_p, f)),
            err_msg=f)
    assert int(st_r.next_id) == int(st_p.next_id)
    assert int(st_r.frame_count) == int(st_p.frame_count)
    # Kalman state: float tolerance (row-sum vs einsum accumulation).
    live = np.asarray(st_r.alive)
    np.testing.assert_allclose(np.asarray(st_r.x)[live],
                               np.asarray(st_p.x)[live],
                               rtol=1e-4, atol=1e-3)


def test_scan_parity_streaming_state_reuse():
    """Threading the kernel's output state into a second clip must
    keep ids continuous, exactly as the XLA scan does."""
    boxes1, valid1 = _random_scene(11, T=6)
    boxes2, valid2 = _random_scene(12, T=6)
    s0 = init_sort(max_tracks=128)

    st_r, _ = sort_scan(s0, boxes1, valid1, max_age=5, min_hits=1,
                        assignment="greedy", impl="xla")
    st_r2, (ids_r, _) = sort_scan(st_r, boxes2, valid2, max_age=5,
                                  min_hits=1, assignment="greedy",
                                  impl="xla")
    st_p, _ = sort_scan_pallas(s0, boxes1, valid1, max_age=5,
                               min_hits=1, interpret=True)
    st_p2, (ids_p, _) = sort_scan_pallas(st_p, boxes2, valid2,
                                         max_age=5, min_hits=1,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(ids_r), np.asarray(ids_p))
    assert int(st_r2.next_id) == int(st_p2.next_id)


def test_scan_parity_empty_and_full_frames():
    """No detections at all, then a full-D burst (spawn pressure)."""
    T, D = 4, 16
    boxes = jnp.asarray(
        np.random.RandomState(0).uniform(0, 200, (T, D, 4)).astype(
            np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 20.0)
    valid = jnp.zeros((T, D), bool).at[2:].set(True)
    s0 = init_sort(max_tracks=128)
    _, (ids_r, rep_r) = sort_scan(s0, boxes, valid, max_age=1,
                                  min_hits=1, assignment="greedy",
                                  impl="xla")
    _, (ids_p, rep_p) = sort_scan_pallas(s0, boxes, valid, max_age=1,
                                         min_hits=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(ids_r), np.asarray(ids_p))
    np.testing.assert_array_equal(np.asarray(rep_r), np.asarray(rep_p))
