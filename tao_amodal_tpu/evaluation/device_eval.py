"""Device-backed Track-mAP evaluation driver.

Glue between the host dataset plumbing and the batched device kernels
(:mod:`tao_amodal_tpu.evaluation.batched`): videos are packed into
padded buckets, each bucket evaluates in ONE jitted call across all
(category x area x time x threshold) cells, and accumulation reuses
the host PR math on the device-produced match tensors.

This is the TPU eval path for large sweeps (the host evaluator stays
the float64 parity oracle; float32 IoU can flip exact-tie matches, so
device metrics may differ in the last decimals).
"""

from __future__ import annotations

from collections import defaultdict

import jax
import numpy as np
import jax.numpy as jnp

from tao_amodal_tpu.evaluation.batched import eval_video_device
from tao_amodal_tpu.evaluation.params import TrackEvalParams
from tao_amodal_tpu.evaluation.track_eval import TrackMapEvaluator
from tao_amodal_tpu.ops.pr import pr_curves


def _next_pow2(n, lo=8):
    p = lo
    while p < n:
        p *= 2
    return p


@jax.jit
def _eval_videos_batched(dt, gt, cat_ids, area_rngs, time_rngs,
                         use_occ, iou_thrs, ious=None):
    """vmap of :func:`eval_video_device` over a stacked video bucket.

    ``ious [n, D, G]``: precomputed track-IoU matrices (segm mode —
    mask runs are host-side RLE math; matching stays on device)."""
    if ious is None:
        return jax.vmap(
            lambda d, g: eval_video_device(d, g, cat_ids, area_rngs,
                                           time_rngs, use_occ,
                                           iou_thrs)
        )(dt, gt)
    return jax.vmap(
        lambda d, g, i: eval_video_device(d, g, cat_ids, area_rngs,
                                          time_rngs, use_occ,
                                          iou_thrs, ious=i)
    )(dt, gt, ious)


class DeviceTrackEval(TrackMapEvaluator):
    """TrackMapEvaluator with the per-video cell math on device.

    With ``mesh`` set (and videos whose padded frame axis divides the
    mesh's data-axis size), the per-video track-IoU matrix is computed
    context-parallel: frames shard across devices, partial (I, U)
    sums combine with a psum — exact, per the 3D-IoU decomposition
    (survey §5).  Long-video eval then scales with chip count.
    """

    def __init__(self, *args, mesh=None, cp_min_frames=64, **kwargs):
        super().__init__(*args, **kwargs)
        self._mesh = mesh
        self._cp_min_frames = cp_min_frames

    def _cell_ious(self, dt_pack, gt_pack, F):
        if self._mesh is None:
            return None
        n_data = self._mesh.shape["data"]
        if F < self._cp_min_frames or F % n_data != 0:
            return None
        from tao_amodal_tpu.parallel.cp import sharded_track_iou

        return sharded_track_iou(
            self._mesh, dt_pack["boxes"], dt_pack["frame_valid"],
            gt_pack["boxes"], gt_pack["frame_valid"])

    def evaluate(self, show_progress=False):
        del show_progress
        self.logger.info("Running per video evaluation.")
        self.logger.info(
            "Evaluate annotation type *{}*".format(self.params.iou_type))
        p = self.params
        p.vid_ids = list(np.unique(p.vid_ids))
        cat_ids = p.cat_ids if p.use_cats else [-1]
        gt_cells, dt_cells = self._grouped_tracks()

        # Group cells per video and pack to padded buckets.
        per_video = defaultdict(lambda: {"dt": [], "gt": []})
        for (vid, cat), tracks in gt_cells.items():
            per_video[vid]["gt"].extend(tracks)
        for (vid, cat), tracks in dt_cells.items():
            per_video[vid]["dt"].extend(tracks)

        cat_arr = jnp.asarray(np.asarray(cat_ids, np.int32))
        area_arr = jnp.asarray(np.asarray(p.area_rng, np.float32))
        time_arr = jnp.asarray(np.asarray(p.time_rng, np.float32))
        use_occ = jnp.asarray(
            np.arange(len(p.area_rng)) == len(p.area_rng) - 1)
        thrs = jnp.asarray(np.asarray(p.iou_thrs, np.float32))

        from collections import defaultdict as _dd

        self.eval_vids = _dd(list)
        if self._mesh is not None:
            # Context-parallel mode: per-video dispatch (the frame axis
            # shards over the mesh; batching videos would fight the CP
            # sharding).
            for v, vid_id in enumerate(p.vid_ids):
                entry = per_video.get(vid_id)
                if entry is None or (
                        not entry["dt"] and not entry["gt"]):
                    continue
                dt_pack, gt_pack, F = self._pack(vid_id, entry, p)
                if p.iou_type == "segm":
                    D = dt_pack["boxes"].shape[0]
                    G = gt_pack["boxes"].shape[0]
                    ious = jnp.asarray(
                        self._segm_ious(entry, p, D, G))
                else:
                    ious = self._cell_ious(dt_pack, gt_pack, F)
                out = eval_video_device(dt_pack, gt_pack, cat_arr,
                                        area_arr, time_arr, use_occ,
                                        thrs, ious=ious)
                self._unpack_video(
                    {k: np.asarray(val) for k, val in out.items()},
                    cat_ids, {c: i for i, c in enumerate(cat_ids)}, p)
            return

        # Bucket videos by padded (D, G, F) and evaluate each bucket
        # chunk in ONE vmapped device call: per-video dispatch+fetch is
        # round-trip-latency-bound on a remote chip (measured 202s for
        # 500 videos vs 6s host — tools/stress_eval.py), while a
        # bucketed sweep amortizes the trip across the whole chunk.
        cat_pos = {cat: c for c, cat in enumerate(cat_ids)}
        buckets = _dd(list)
        for v, vid_id in enumerate(p.vid_ids):
            entry = per_video.get(vid_id)
            if entry is None or (not entry["dt"] and not entry["gt"]):
                continue
            present = sorted({tr["category_id"]
                              for side in ("dt", "gt")
                              for tr in entry[side]
                              if tr["category_id"] in cat_pos})
            K = _next_pow2(max(len(present), 1), lo=4)
            dt_pack, gt_pack, F = self._pack(vid_id, entry, p,
                                             as_jax=False)
            cell_cats = np.full((K,), -2, np.int32)
            cell_cats[:len(present)] = present
            dt_pack["cell_cats"] = cell_cats
            D = dt_pack["boxes"].shape[0]
            G = gt_pack["boxes"].shape[0]
            seg_ious = (self._segm_ious(entry, p, D, G)
                        if p.iou_type == "segm" else None)
            buckets[D, G, F, K].append(
                (v, dt_pack, gt_pack, present, seg_ious))

        C_n = max(len(cat_ids), 1)
        n_cells = C_n * len(p.area_rng) * len(p.time_rng) \
            * len(p.iou_thrs)
        budget = getattr(self, "chunk_budget_bytes", 100 << 20)
        min_chunk = getattr(self, "min_chunk", 4)
        staged = []  # (video index, host out dict, present cats)
        for (D, G, F, K), items in sorted(buckets.items()):
            per_video_bytes = K * len(p.area_rng) * len(p.time_rng) \
                * len(p.iou_thrs) * (D + G) * 3
            chunk = max(min_chunk,
                        min(1024, budget // max(per_video_bytes, 1)))
            # One compiled program per bucket: fix the video axis at
            # `chunk` and zero-pad the tail (exists=False videos fall
            # out via cell_valid). Distinct remainder lengths would
            # otherwise each recompile — ruinous through a remote
            # tunnel where one compile costs tens of seconds.
            chunk = min(chunk, _next_pow2(len(items), lo=min_chunk))
            for s in range(0, len(items), chunk):
                part = items[s:s + chunk]
                pad = chunk - len(part)

                def stack(idx):
                    return {k: jnp.asarray(np.concatenate(
                        [np.stack([it[idx][k] for it in part])]
                        + ([np.zeros((pad,) + part[0][idx][k].shape,
                                     part[0][idx][k].dtype)]
                           if pad else [])))
                        for k in part[0][idx]}

                if p.iou_type == "segm":
                    seg = np.zeros((chunk, D, G), np.float32)
                    for bi, it in enumerate(part):
                        seg[bi] = it[4]
                    seg = jnp.asarray(seg)
                else:
                    seg = None
                out = _eval_videos_batched(stack(1), stack(2), None,
                                           area_arr, time_arr,
                                           use_occ, thrs, ious=seg)
                out = {k: np.asarray(val) for k, val in out.items()}
                for bi, (v, _d, _g, present, _s) in enumerate(part):
                    staged.append(
                        (v, {k: val[bi] for k, val in out.items()},
                         present))
        # Unpack in VIDEO order: accumulate()'s stable score sort is
        # order-sensitive on ties, and the host oracle appends cells in
        # video order.
        staged.sort(key=lambda item: item[0])
        for _v, out, present in staged:
            self._unpack_video(out, present, cat_pos, p)

    def _unpack_video(self, out, present, cat_pos, p):
        for k, cat in enumerate(present):
            if not out["cell_valid"][k, 0, 0]:
                continue
            c = cat_pos[cat]
            for a in range(len(p.area_rng)):
                for t in range(len(p.time_rng)):
                    in_cell = out["dt_in_cell"][k, a, t]
                    self.eval_vids[c, a, t].append({
                        "dt_matches":
                            out["dt_matches"][k, a, t][:, in_cell],
                        "dt_ignore":
                            out["dt_ignore"][k, a, t][:, in_cell],
                        "dt_scores": out["dt_scores"][in_cell],
                        "gt_ignore": out["gt_ignore"][k, a, t],
                    })

    def _pack(self, vid_id, entry, p, as_jax=True):
        frames = sorted({ann["image_id"] for side in ("dt", "gt")
                         for tr in entry[side]
                         for ann in tr["annotations"]})
        fidx = {f: i for i, f in enumerate(frames)}
        # Pow2 buckets on every axis -> one compile per bucket combo.
        F = _next_pow2(max(len(frames), 1))
        D = _next_pow2(len(entry["dt"]))
        G = _next_pow2(len(entry["gt"]))

        def base(n):
            return {
                "boxes": np.zeros((n, F, 4), np.float32),
                "frame_valid": np.zeros((n, F), bool),
                "cats": np.full((n,), -1, np.int32),
                "areas": np.zeros((n,), np.float32),
                "durs": np.zeros((n,), np.float32),
                "exists": np.zeros((n,), bool),
            }

        dt = base(D)
        dt["scores"] = np.full((D,), -np.inf, np.float32)
        dt["nel"] = np.zeros((D,), bool)
        for i, tr in enumerate(entry["dt"]):
            for ann in tr["annotations"]:
                f = fidx[ann["image_id"]]
                dt["boxes"][i, f] = ann["bbox"]
                dt["frame_valid"][i, f] = True
            dt["cats"][i] = tr["category_id"]
            dt["areas"][i] = tr["area"]
            dt["durs"][i] = len(tr["annotations"])
            dt["scores"][i] = tr["score"]
            dt["nel"][i] = (tr["category_id"]
                            in self.vid_nel[tr["video_id"]])
            dt["exists"][i] = True

        gt = base(G)
        gt["hp_frames"] = np.zeros((G,), np.float32)
        gt["ignore0"] = np.zeros((G,), np.float32)
        for i, tr in enumerate(entry["gt"]):
            for ann in tr["annotations"]:
                f = fidx[ann["image_id"]]
                gt["boxes"][i, f] = ann["bbox"]
                gt["frame_valid"][i, f] = True
            gt["cats"][i] = tr["category_id"]
            gt["areas"][i] = tr["area"]
            gt["durs"][i] = len(tr["annotations"])
            gt["hp_frames"][i] = sum(
                a["visibility"] < p.hp_visibility_thr
                for a in tr["annotations"])
            gt["ignore0"][i] = tr.get("ignore", 0)
            gt["exists"][i] = True
        if not as_jax:
            return dt, gt, F
        return ({k: jnp.asarray(v) for k, v in dt.items()},
                {k: jnp.asarray(v) for k, v in gt.items()},
                F)

    def _segm_ious(self, entry, p, D, G):
        """Padded ``[D, G]`` mask track-IoU matrix for one video.

        Mask runs stay on host (the native RLE run-sweep codec —
        shipping dense HxW masks per track would swamp the
        host->device link); the (C, A, T, thr) matching cells still
        run on device.  Annotation-order matrix; the device kernel
        applies its own score sort.
        """
        from tao_amodal_tpu.ops.track_iou import track_mask_iou_matrix

        frames = sorted({ann["image_id"] for side in ("dt", "gt")
                         for tr in entry[side]
                         for ann in tr["annotations"]})
        fidx = {f: i for i, f in enumerate(frames)}
        out = np.zeros((D, G), np.float32)
        if entry["dt"] and entry["gt"]:
            m = np.asarray(track_mask_iou_matrix(
                self._track_rle_columns(entry["dt"], fidx),
                self._track_rle_columns(entry["gt"], fidx),
                mode=p.iou_3d_type), np.float32)
            out[:m.shape[0], :m.shape[1]] = m
        return out
