"""ATOM: online GD/CG-trained classifier + IoUNet box refinement.

Capability-parity with the reference ATOM tracker
(``pytracking/pytracking/tracker/atom/atom.py:1-777``):

  * first-frame *joint factorized optimization* of the correlation
    filter and a channel-projection matrix (``init_optimization``,
    ``atom.py:135-219`` / ``FactorizedConvProblem``), seeded by PCA;
  * online-only learning — no meta-learned filter (the DiMP
    difference): the classifier is (re)trained purely from the sample
    memory with ConjugateGradient / GradientDescentL2
    (``atom.py:196-214``, ``optimizer`` parameter);
  * sample memory with learning-rate weighting and min-weight
    replacement (``update_memory``);
  * advanced localization with hard-negative / not-found / uncertain
    flags driving adaptive update schedules (``localize_advanced``,
    ``atom.py:338-420``; hard negatives get extra optimizer iterations
    and a boosted learning rate, ``atom.py:266-285``);
  * multi-scale search (``scale_factors``) and IoUNet gradient-ascent
    box refinement (``refine_target_box``, shared with DiMP).

TPU-first: the per-frame step is ONE jitted program — multi-scale
feature extraction is a ``vmap`` over crops, the filter update a CG
``fori_loop`` (filter response is linear in the filter, so one
Gauss-Newton step IS the reference's ConjugateGradient on the normal
equations), the flag logic branch-free, and correlation runs on the
MXU instead of the reference's FFT pipeline.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.ops.optimization import (
    gauss_newton_cg,
    gradient_descent_l2,
)
from tao_amodal_tpu.trackers import discriminative as disc
from tao_amodal_tpu.trackers.base import Tracker
from tao_amodal_tpu.trackers.siamrpn import crop_subwindow


class AtomState(NamedTuple):
    proj: jax.Array        # [C, Cc] projection matrix
    filt: jax.Array        # [fh, fw, Cc]
    memory: disc.SampleMemory
    labels: jax.Array      # [K, S, S] desired responses per sample
    center: jax.Array      # [2] (cx, cy) image coords
    size: jax.Array        # [2] (w, h)
    avg: jax.Array         # [3] channel means for border fill
    frame: jax.Array       # [] int32
    flag: jax.Array        # [] int32 last localization flag
    mod_vec: jax.Array     # IoUNet modulation vector (or dummy)


def _default_features(crop):
    """Cheap dense features when no backbone is plugged in: normalized
    pixels + finite-difference gradients (6 channels)."""
    x = crop.astype(jnp.float32) / 255.0
    gx = jnp.diff(x, axis=1, append=x[:, -1:])
    gy = jnp.diff(x, axis=0, append=x[-1:])
    return jnp.concatenate([x - x.mean(), gx, gy], axis=-1)


class AtomTracker(Tracker):
    """Host wrapper; init/step are jitted closures.

    Args:
      feature_fn: ``crop [P, P, 3] -> feats [S, S, C]`` where ``P``
        is ``sample_size`` (default ``search_size``; stride-1 pixel
        features).  Deep features set ``sample_size = S * stride`` so
        the backbone's stride-``stride`` map lands back on the SxS
        response grid (see :mod:`..trackers.deep_features`).
      iou_net / iou_variables: optional IoUNet for box refinement
        (``use_iou_net`` in the reference); scale is otherwise updated
        from the multi-scale classifier search.
      optimizer: 'cg' (reference GaussNewtonCG/ConjugateGradient
        default) or 'gd' (GradientDescentL2).
    """

    def __init__(self, feature_fn=None, iou_net=None,
                 iou_variables=None, search_size=96, sample_size=None,
                 filter_size=15,
                 compressed_dim=8, memory_size=16,
                 search_area_scale=4.0, learning_rate=0.02,
                 hard_negative_learning_rate=0.1, train_skipping=4,
                 cg_iter=4, hard_negative_cg_iter=8, init_gn_iter=4,
                 init_cg_iter=6, scale_factors=(0.97, 1.0, 1.03),
                 optimizer="cg", filter_reg=1e-2, proj_reg=1e-4,
                 target_not_found=0.25, distractor_threshold=0.8,
                 hard_negative_threshold=0.5):
        self.feature_fn = feature_fn or _default_features
        self.iou_net = iou_net
        self.iou_vars = iou_variables
        self.S = search_size
        self.P = sample_size or search_size
        self.fsz = filter_size
        self.cdim = compressed_dim
        self.K = memory_size
        self.area_scale = search_area_scale
        self.lr = learning_rate
        self.hn_lr = hard_negative_learning_rate
        self.train_skipping = train_skipping
        self.cg_iter = cg_iter
        self.hn_cg_iter = hard_negative_cg_iter
        self.init_gn_iter = init_gn_iter
        self.init_cg_iter = init_cg_iter
        self.scales = np.asarray(scale_factors, np.float32)
        self.optimizer = optimizer
        self.filter_reg = filter_reg
        self.proj_reg = proj_reg
        self.target_not_found = target_not_found
        self.distractor_threshold = distractor_threshold
        self.hard_negative_threshold = hard_negative_threshold
        self.state = None
        self._build()

    # -- model pieces ----------------------------------------------

    def _response(self, feats_win, proj, filt):
        """Windowed feats [.., S, S, C] -> response [.., S, S]."""
        compressed = feats_win @ proj
        return disc.correlate(compressed, filt)

    def _label_sigma(self, size_px, crop_sz):
        # sigma proportional to target size in sample pixels
        # (reference output_sigma_factor semantics).
        scale = self.S / crop_sz
        return 0.25 * jnp.sqrt(jnp.prod(size_px)) * scale

    # -- jitted closures -------------------------------------------

    def _build(self):
        S = self.S
        window = disc.hann2d((S, S))[:, :, None]
        scales = jnp.asarray(self.scales)
        use_iou = self.iou_net is not None

        def extract(image, center, crop_sz, avg):
            crop = crop_subwindow(image, center, crop_sz, self.P, avg)
            return self.feature_fn(crop) * window

        @jax.jit
        def init_fn(image, box_xywh):
            box = jnp.asarray(box_xywh, jnp.float32)
            center = jnp.array([box[0] + box[2] / 2,
                                box[1] + box[3] / 2])
            size = box[2:4]
            avg = jnp.mean(image.astype(jnp.float32), axis=(0, 1))
            crop_sz = jnp.sqrt(jnp.prod(size)) * self.area_scale

            crop = crop_subwindow(image, center, crop_sz, self.P,
                                  avg)
            aug = disc.augment_init_samples(crop)          # [A,P,P,3]
            feats = jax.vmap(self.feature_fn)(aug) * window
            C = feats.shape[-1]

            # PCA-seeded projection (reference init_projection_matrix).
            proj0 = disc.pca_projection(feats, self.cdim)

            sigma = self._label_sigma(size, crop_sz)
            y = disc.gaussian_label(
                (S, S), jnp.array([(S - 1) / 2.0, (S - 1) / 2.0]),
                sigma)
            labels0 = jnp.broadcast_to(y, feats.shape[:1] + (S, S))

            # Joint factorized optimization over {filter, projection}
            # (reference FactorizedConvProblem + GaussNewtonCG /
            # GradientDescentL2).
            filt0 = jnp.zeros((self.fsz, self.fsz, self.cdim))

            def residual(p):
                resp = self._response(feats, p["proj"], p["filt"])
                return {
                    "data": (resp - labels0)
                    / jnp.sqrt(1.0 * feats.shape[0]),
                    "reg_f": jnp.sqrt(self.filter_reg) * p["filt"],
                    "reg_p": jnp.sqrt(self.proj_reg)
                    * (p["proj"] - proj0),
                }

            params = {"proj": proj0, "filt": filt0}
            if self.optimizer == "gd":
                def loss(p):
                    r = residual(p)
                    return sum(jnp.sum(v ** 2)
                               for v in jax.tree_util.tree_leaves(r))
                params = gradient_descent_l2(
                    loss, params,
                    num_iters=self.init_gn_iter * self.init_cg_iter,
                    step_length=0.1, momentum=0.9)
            else:
                params, _ = gauss_newton_cg(
                    residual, params, num_gn_iters=self.init_gn_iter,
                    num_cg_iters=self.init_cg_iter)
            proj, filt = params["proj"], params["filt"]

            # Memory holds RAW windowed features; projection stays
            # fixed after init (reference: update_projection_matrix
            # only during init optimization).
            mem = disc.init_memory(self.K, (S, S, C), feats)
            labels = jnp.zeros((self.K, S, S)).at[
                :feats.shape[0]].set(labels0)

            if use_iou:
                scale = S / crop_sz
                box_crop = jnp.array([
                    (S - 1) / 2 - size[0] * scale / 2,
                    (S - 1) / 2 - size[1] * scale / 2,
                    (S - 1) / 2 + size[0] * scale / 2,
                    (S - 1) / 2 + size[1] * scale / 2])
                mod = self.iou_net.apply(
                    self.iou_vars, feats[0], box_crop,
                    spatial_scale=1.0, method="modulation")
            else:
                mod = jnp.zeros((1,))

            return AtomState(proj, filt, mem, labels, center, size,
                             avg, jnp.ones((), jnp.int32),
                             jnp.zeros((), jnp.int32), mod)

        @jax.jit
        def step_fn(state: AtomState, image):
            crop_sz = (jnp.sqrt(jnp.prod(state.size))
                       * self.area_scale)

            feats3 = jax.vmap(
                lambda s: extract(image, state.center, crop_sz * s,
                                  state.avg))(scales)      # [3,S,S,C]
            resps = self._response(feats3, state.proj, state.filt)

            peaks = jnp.max(resps.reshape(len(self.scales), -1),
                            axis=1)
            k = jnp.argmax(peaks)
            resp = resps[k]
            scale_k = scales[k]

            # target size in score cells at the chosen scale
            cells = state.size * (S / (crop_sz * scale_k))
            disp, max_score, flag = disc.localize_advanced(
                resp, cells[::-1],
                target_not_found=self.target_not_found,
                distractor_threshold=self.distractor_threshold,
                hard_negative_threshold=self.hard_negative_threshold)

            px = crop_sz * scale_k / S
            center = state.center + disp[::-1] * px  # rc -> xy
            size = state.size * jnp.where(flag == disc.FLAG_NOT_FOUND,
                                          1.0, scale_k)
            center = jnp.where(flag == disc.FLAG_NOT_FOUND,
                               state.center, center)

            # IoUNet refinement (in crop coords of the chosen scale).
            if use_iou:
                scale = S / (crop_sz * scale_k)
                w = size[0] * scale
                h = size[1] * scale
                cx = (S - 1) / 2 + disp[1]
                cy = (S - 1) / 2 + disp[0]
                from tao_amodal_tpu.models.dimp import (
                    refine_box_ascent,
                )
                box0 = jnp.array([cx - w / 2, cy - h / 2,
                                  cx + w / 2, cy + h / 2])
                refined, _ = refine_box_ascent(
                    self.iou_net, self.iou_vars, feats3[k],
                    state.mod_vec, box0, steps=3, step_size=0.25,
                    spatial_scale=1.0)
                ok = flag != disc.FLAG_NOT_FOUND
                new_c = state.center + jnp.array([
                    (refined[0] + refined[2]) / 2 - (S - 1) / 2,
                    (refined[1] + refined[3]) / 2 - (S - 1) / 2,
                ]) / scale
                new_s = jnp.array([refined[2] - refined[0],
                                   refined[3] - refined[1]]) / scale
                center = jnp.where(ok, new_c, center)
                size = jnp.where(ok, 0.6 * size + 0.4 * new_s, size)

            # Memory update unless lost/uncertain (reference
            # update_flag), with boosted lr on hard negatives.
            do_update = ((flag == disc.FLAG_NORMAL)
                         | (flag == disc.FLAG_HARD_NEGATIVE))
            lr = jnp.where(flag == disc.FLAG_HARD_NEGATIVE,
                           self.hn_lr, self.lr)

            sigma = self._label_sigma(size, crop_sz * scale_k)
            label = disc.gaussian_label(
                (S, S),
                jnp.array([(S - 1) / 2.0 + disp[0],
                           (S - 1) / 2.0 + disp[1]]), sigma)

            def with_update(args):
                mem, labels = args
                new_mem, r_ind = disc.update_memory(
                    mem, feats3[k], lr)
                return new_mem, labels.at[r_ind].set(label)

            mem, labels = jax.lax.cond(
                do_update, with_update, lambda a: a,
                (state.memory, state.labels))

            # Filter-only re-optimization: every train_skipping frames
            # normally, immediately (more iterations) on hard
            # negatives.  Linear in the filter -> one GN outer step ==
            # reference ConjugateGradient on the normal equations.
            def optimize(filt, n_extra):
                w_s = jnp.sqrt(mem.weights)[:, None, None]
                proj_mem = mem.samples @ state.proj  # project once

                def residual(f):
                    resp = disc.correlate(proj_mem, f)
                    return {"data": (resp - labels) * w_s,
                            "reg": jnp.sqrt(self.filter_reg) * f}

                new_f, _ = gauss_newton_cg(
                    residual, filt, num_gn_iters=1,
                    num_cg_iters=self.cg_iter + n_extra)
                return new_f

            hard_neg = flag == disc.FLAG_HARD_NEGATIVE
            periodic = (state.frame % self.train_skipping) == 0
            filt = jax.lax.cond(
                hard_neg,
                lambda f: optimize(f, self.hn_cg_iter - self.cg_iter),
                lambda f: jax.lax.cond(periodic,
                                       lambda g: optimize(g, 0),
                                       lambda g: g, f),
                state.filt)

            new_state = AtomState(
                state.proj, filt, mem, labels, center, size,
                state.avg, state.frame + 1, flag, state.mod_vec)
            box = jnp.array([center[0] - size[0] / 2,
                             center[1] - size[1] / 2,
                             size[0], size[1]])
            return new_state, (box, max_score, flag)

        self.init_fn = init_fn
        self.step_fn = step_fn

    # -- Tracker interface ------------------------------------------

    def init(self, image, box):
        self.state = self.init_fn(jnp.asarray(image), np.asarray(box))

    def update(self, image):
        self.state, (box, score, flag) = self.step_fn(
            self.state, jnp.asarray(image))
        self.last_flag = int(flag)
        return np.asarray(box), float(score)
