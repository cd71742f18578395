"""Online discriminative tracker (DiMP/ATOM capability).

Parity with the reference online loop (``pytracking/pytracking/tracker/
dimp/dimp.py:20-657``): initialize a correlation filter on the first
frame, per frame classify -> localize -> IoUNet box refinement, push
the new sample into a fixed-size memory ring, and periodically
re-optimize the filter on the memory — all expressed as jitted device
programs (the memory is a static ring buffer, the re-optimization a
Gauss-Newton/CG ``fori_loop``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.models.dimp import (
    classify,
    refine_box_ascent,
    train_filter,
)
from tao_amodal_tpu.trackers.base import Tracker
from tao_amodal_tpu.trackers.siamrpn import crop_subwindow


class DimpState(NamedTuple):
    filt: jax.Array          # [fh, fw, C]
    memory_feats: jax.Array  # [M, H, W, C]
    memory_labels: jax.Array  # [M, Ho, Wo]
    memory_valid: jax.Array  # [M]
    mem_ptr: jax.Array       # []
    center: jax.Array        # [2] (cx, cy) image coords
    size: jax.Array          # [2] (w, h)
    mod_vec: jax.Array       # IoUNet modulation vector
    frame: jax.Array         # [] frame counter


def gaussian_label(shape, center, sigma=2.0):
    """Desired response map: gaussian peak at ``center`` (row, col)."""
    h, w = shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    return jnp.exp(-((ys - center[0]) ** 2 + (xs - center[1]) ** 2)
                   / (2 * sigma ** 2))


class DimpTracker(Tracker):
    """Host wrapper; the heavy steps are jitted closures."""

    def __init__(self, extractor_fn, iou_net, iou_variables,
                 search_size=288, filter_size=4, feat_stride=16,
                 memory_size=16, update_interval=8):
        """
        Args:
          extractor_fn: jittable ``image_crop [S, S, 3] -> feat
            [h, w, C]`` backbone+classifier embedding.
          iou_net: :class:`tao_amodal_tpu.models.dimp.IoUNet` module.
        """
        self.extract = extractor_fn
        self.iou_net = iou_net
        self.iou_vars = iou_variables
        self.search_size = search_size
        self.filter_size = filter_size
        self.stride = feat_stride
        self.memory_size = memory_size
        self.update_interval = update_interval
        self.state = None
        self._build()

    def _build(self):
        S = self.search_size
        fs = self.filter_size
        stride = self.stride
        feat_hw = S // stride
        out_hw = feat_hw - fs + 1
        M = self.memory_size

        @jax.jit
        def init_fn(image, box_xywh):
            box = jnp.asarray(box_xywh, jnp.float32)
            center = jnp.array([box[0] + box[2] / 2,
                                box[1] + box[3] / 2])
            size = box[2:4]
            crop_sz = jnp.sqrt(jnp.prod(size)) * 5.0
            avg = jnp.mean(image.astype(jnp.float32), axis=(0, 1))
            crop = crop_subwindow(image, center, crop_sz, S, avg)
            feat = self.extract(crop)
            C = feat.shape[-1]

            label = gaussian_label((out_hw, out_hw),
                                   jnp.array([out_hw / 2 - 0.5,
                                              out_hw / 2 - 0.5]))
            mem_f = jnp.zeros((M,) + feat.shape).at[0].set(feat)
            mem_l = jnp.zeros((M, out_hw, out_hw)).at[0].set(label)
            mem_v = jnp.zeros((M,), bool).at[0].set(True)

            filt, _ = train_filter(
                feat[None], label[None], (fs, fs, C),
                num_gn_iters=5, num_cg_iters=8)

            # IoUNet modulation from the initial target box in crop
            # coordinates.
            scale = S / crop_sz
            box_crop = jnp.array([
                S / 2 - size[0] * scale / 2, S / 2 - size[1] * scale / 2,
                S / 2 + size[0] * scale / 2, S / 2 + size[1] * scale / 2,
            ])
            mod = self.iou_net.apply(
                self.iou_vars, feat, box_crop,
                spatial_scale=1.0 / stride, method="modulation")
            return DimpState(filt, mem_f, mem_l, mem_v,
                             jnp.ones((), jnp.int32), center, size, mod,
                             jnp.ones((), jnp.int32))

        @jax.jit
        def step_fn(state: DimpState, image):
            crop_sz = jnp.sqrt(jnp.prod(state.size)) * 5.0
            avg = jnp.mean(image.astype(jnp.float32), axis=(0, 1))
            crop = crop_subwindow(image, state.center, crop_sz, S, avg)
            feat = self.extract(crop)

            resp = classify(feat[None], state.filt)[0]  # [Ho, Wo]
            peak = jnp.unravel_index(jnp.argmax(resp), resp.shape)
            score = resp[peak[0], peak[1]]
            # Feature-grid peak -> crop pixel -> image displacement.
            crop_scale = crop_sz / S
            disp = (jnp.array([peak[1], peak[0]], jnp.float32)
                    - (out_hw - 1) / 2) * stride * crop_scale
            center = state.center + disp

            # IoUNet refinement in crop coordinates.
            scale = S / crop_sz
            w = state.size[0] * scale
            h = state.size[1] * scale
            cx = S / 2 + disp[0] * scale
            cy = S / 2 + disp[1] * scale
            box0 = jnp.array([cx - w / 2, cy - h / 2,
                              cx + w / 2, cy + h / 2])
            refined, iou = refine_box_ascent(
                self.iou_net, self.iou_vars, feat, state.mod_vec, box0,
                steps=5, step_size=0.5, spatial_scale=1.0 / stride)
            new_w = (refined[2] - refined[0]) / scale
            new_h = (refined[3] - refined[1]) / scale
            new_cx = state.center[0] + ((refined[0] + refined[2]) / 2
                                        - S / 2) / scale
            new_cy = state.center[1] + ((refined[1] + refined[3]) / 2
                                        - S / 2) / scale
            center = jnp.array([new_cx, new_cy])
            size = 0.7 * state.size + 0.3 * jnp.array([new_w, new_h])

            # Memory push + periodic filter re-optimization.
            label = gaussian_label(
                (out_hw, out_hw),
                jnp.array([peak[0], peak[1]], jnp.float32))
            ptr = state.mem_ptr % M
            mem_f = state.memory_feats.at[ptr].set(feat)
            mem_l = state.memory_labels.at[ptr].set(label)
            mem_v = state.memory_valid.at[ptr].set(True)

            def reoptimize(filt):
                weights = mem_v.astype(jnp.float32)

                def residual(f):
                    r = classify(mem_f, f) - mem_l
                    return {"data": r * weights[:, None, None],
                            "reg": 0.1 * f}

                from tao_amodal_tpu.ops.optimization import (
                    gauss_newton_cg,
                )

                new_filt, _ = gauss_newton_cg(residual, filt,
                                              num_gn_iters=2,
                                              num_cg_iters=5)
                return new_filt

            filt = jax.lax.cond(
                state.frame % self.update_interval == 0,
                reoptimize, lambda f: f, state.filt)

            new_state = DimpState(
                filt, mem_f, mem_l, mem_v, state.mem_ptr + 1, center,
                size, state.mod_vec, state.frame + 1)
            box = jnp.array([center[0] - size[0] / 2,
                             center[1] - size[1] / 2, size[0], size[1]])
            return new_state, (box, score)

        self.init_fn = init_fn
        self.step_fn = step_fn

    def init(self, image, box):
        self.state = self.init_fn(jnp.asarray(image), np.asarray(box))

    def update(self, image):
        self.state, (box, score) = self.step_fn(self.state,
                                                jnp.asarray(image))
        return np.asarray(box), float(score)
