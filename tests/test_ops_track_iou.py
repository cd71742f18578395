"""track_iou_matrix vs an independent naive dict-based implementation.

The naive versions below re-derive the three track-IoU definitions from
the protocol spec (reference eval.py:51-117) as plain loops, serving as
an independent check of the batched kernel.
"""

import numpy as np

from tao_amodal_tpu.ops.boxes import box_intersect_union
from tao_amodal_tpu.ops.track_iou import track_iou_matrix, track_iou_partials


def _naive(dt_track, gt_track, mode):
    frames = set(dt_track) | set(gt_track)
    if mode == "3d_iou":
        i_sum = u_sum = 0.0
        for f in frames:
            d, g = dt_track.get(f), gt_track.get(f)
            if d is not None and g is not None:
                i, u = box_intersect_union(np.array(d), np.array(g), xp=np)
                i_sum += float(i)
                u_sum += float(u)
            elif g is not None:
                u_sum += g[2] * g[3]
            elif d is not None:
                u_sum += d[2] * d[3]
        return i_sum / u_sum if u_sum > 0 else 0.0
    if mode == "avg_iou":
        vals = []
        for f in frames:
            d, g = dt_track.get(f), gt_track.get(f)
            if d is not None and g is not None:
                i, u = box_intersect_union(np.array(d), np.array(g), xp=np)
                vals.append(float(i) / float(u) if u > 0 else 0.0)
            elif d is not None or g is not None:
                vals.append(0.0)
        return float(np.mean(vals)) if vals else 0.0
    if mode == "imagenetvid":
        matched = total = 0
        for f in frames:
            d, g = dt_track.get(f), gt_track.get(f)
            if d is not None and g is not None:
                i, u = box_intersect_union(np.array(d), np.array(g), xp=np)
                if i > 0.5 * u:
                    matched += 1
            if d is not None or g is not None:
                total += 1
        return matched / total if total else 0.0
    raise ValueError(mode)


def _random_tracks(rng, n_tracks, n_frames):
    tracks = []
    for _ in range(n_tracks):
        track = {}
        for f in range(n_frames):
            if rng.rand() < 0.6:
                x, y = rng.uniform(0, 100, 2)
                w, h = rng.uniform(5, 60, 2)
                track[f] = [x, y, w, h]
        tracks.append(track)
    return tracks


def _to_columns(tracks, n_frames):
    T = len(tracks)
    boxes = np.zeros((T, n_frames, 4))
    valid = np.zeros((T, n_frames), bool)
    for t, track in enumerate(tracks):
        for f, b in track.items():
            boxes[t, f] = b
            valid[t, f] = True
    return boxes, valid


def test_all_modes_vs_naive():
    rng = np.random.RandomState(3)
    F = 12
    dts = _random_tracks(rng, 5, F)
    gts = _random_tracks(rng, 4, F)
    d_boxes, d_valid = _to_columns(dts, F)
    g_boxes, g_valid = _to_columns(gts, F)
    for mode in ("3d_iou", "avg_iou", "imagenetvid"):
        got = np.asarray(track_iou_matrix(
            d_boxes, d_valid, g_boxes, g_valid, mode=mode, xp=np))
        for i in range(5):
            for j in range(4):
                exp = _naive(dts[i], gts[j], mode)
                assert abs(got[i, j] - exp) < 1e-10, (mode, i, j)


def test_partials_shard_exactness():
    """Frame-sharded partial sums combine to the exact global 3D IoU."""
    rng = np.random.RandomState(4)
    F = 16
    dts = _random_tracks(rng, 3, F)
    gts = _random_tracks(rng, 3, F)
    d_boxes, d_valid = _to_columns(dts, F)
    g_boxes, g_valid = _to_columns(gts, F)

    full = np.asarray(track_iou_matrix(
        d_boxes, d_valid, g_boxes, g_valid, xp=np))

    i_tot = np.zeros((3, 3))
    u_tot = np.zeros((3, 3))
    for s in range(4):  # 4 shards of 4 frames
        sl = slice(s * 4, (s + 1) * 4)
        i_p, u_p = track_iou_partials(
            d_boxes[:, sl], d_valid[:, sl], g_boxes[:, sl], g_valid[:, sl],
            xp=np)
        i_tot += i_p
        u_tot += u_p
    combined = np.where(u_tot > 0, i_tot / np.where(u_tot > 0, u_tot, 1), 0)
    np.testing.assert_allclose(combined, full, atol=1e-12)


def test_jax_matches_numpy():
    rng = np.random.RandomState(5)
    F = 8
    dts = _random_tracks(rng, 4, F)
    gts = _random_tracks(rng, 4, F)
    d_boxes, d_valid = _to_columns(dts, F)
    g_boxes, g_valid = _to_columns(gts, F)
    import jax.numpy as jnp

    for mode in ("3d_iou", "avg_iou", "imagenetvid"):
        got_np = np.asarray(track_iou_matrix(
            d_boxes, d_valid, g_boxes, g_valid, mode=mode, xp=np))
        got_jax = np.asarray(track_iou_matrix(
            jnp.asarray(d_boxes, jnp.float32), jnp.asarray(d_valid),
            jnp.asarray(g_boxes, jnp.float32), jnp.asarray(g_valid),
            mode=mode))
        np.testing.assert_allclose(got_np, got_jax, atol=1e-4)
