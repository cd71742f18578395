"""ECO: factorized convolution + sample-space memory + CG updates.

Capability-parity with the full reference ECO
(``pytracking/pytracking/tracker/eco/eco.py:1-382``):

  * **factorized convolution**: a learned channel-projection matrix
    compresses features before correlation; PCA-seeded
    (``eco.py:107-111``) and jointly optimized with the filter at init
    by Gauss-Newton/CG (``FactorizedConvProblem`` + ``GaussNewtonCG``,
    ``eco.py:150-156``);
  * **sample-space memory**: a fixed-capacity sample store with
    learning-rate weighting and min-weight replacement
    (``update_memory`` / ``update_sample_weights``, ``eco.py:337-368``);
  * **CG filter updates** every ``train_skipping`` frames on the
    weighted memory (``FilterOptim``, ``eco.py:229-233``);
  * multi-scale localization (``scale_factors``), hann windowing,
    gaussian labels, augmented first-frame samples.

TPU-first: the reference lives in the Fourier domain because FFTs make
correlation cheap on CPU/GPU; on TPU the MXU makes *direct spatial
correlation* the fast path, so filter, memory, and CG all operate on
spatial maps (conv = ``lax.conv_general_dilated`` on the MXU) and the
whole per-frame step is one jitted program.  The legacy single-filter
fourier core is kept in :mod:`tao_amodal_tpu.ops.fourier` for the DCF
primitives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.ops.optimization import gauss_newton_cg
from tao_amodal_tpu.trackers import discriminative as disc
from tao_amodal_tpu.trackers.base import Tracker
from tao_amodal_tpu.trackers.siamrpn import crop_subwindow


class EcoState(NamedTuple):
    proj: jax.Array       # [C, Cc] projection (factorized conv)
    filt: jax.Array       # [fh, fw, Cc]
    memory: disc.SampleMemory  # samples: [K, S, S, Cc] (projected)
    center: jax.Array     # [2] (cx, cy)
    size: jax.Array       # [2] (w, h)
    avg: jax.Array        # [3]
    frame: jax.Array      # [] int32


class EcoTracker(Tracker):
    """Host wrapper; init/step are jitted closures.

    Args:
      feature_fn: crop ``[P, P, 3]`` -> features ``[S, S, C]``
        with ``P = sample_size`` (default ``search_size``: stride-1
        normalized pixels + gradient channels).  Deep features set
        ``sample_size = S * stride`` (see
        :mod:`..trackers.deep_features`).
    """

    def __init__(self, feature_fn=None, search_size=96,
                 sample_size=None, filter_size=15, compressed_dim=8, memory_size=16,
                 search_area_scale=4.0, learning_rate=0.01,
                 train_skipping=5, cg_iter=5, init_gn_iter=4,
                 init_cg_iter=6, filter_reg=1e-2, proj_reg=1e-4,
                 scale_factors=(0.97, 1.0, 1.03)):
        self.S = search_size
        self.P = sample_size or search_size
        self.fsz = filter_size
        self.cdim = compressed_dim
        self.K = memory_size
        self.area_scale = search_area_scale
        self.lr = learning_rate
        self.train_skipping = train_skipping
        self.cg_iter = cg_iter
        self.init_gn_iter = init_gn_iter
        self.init_cg_iter = init_cg_iter
        self.filter_reg = filter_reg
        self.proj_reg = proj_reg
        self.scales = np.asarray(scale_factors, np.float32)
        self.feature_fn = feature_fn or self._pixel_features
        self.state = None
        self._build()

    @staticmethod
    def _pixel_features(crop):
        x = crop.astype(jnp.float32) / 255.0
        gx = jnp.diff(x, axis=1, append=x[:, -1:])
        gy = jnp.diff(x, axis=0, append=x[-1:])
        return jnp.concatenate([x - x.mean(), gx, gy], axis=-1)

    def _build(self):
        S = self.S
        window = disc.hann2d((S, S))[:, :, None]
        scales = jnp.asarray(self.scales)

        def features(image, center, crop_size, avg):
            crop = crop_subwindow(image, center, crop_size, self.P,
                                  avg)
            return self.feature_fn(crop) * window

        def label_sigma(size_px, crop_sz):
            return 0.25 * jnp.sqrt(jnp.prod(size_px)) * (S / crop_sz)

        @jax.jit
        def init_fn(image, box):
            box = jnp.asarray(box, jnp.float32)
            center = jnp.array([box[0] + box[2] / 2,
                                box[1] + box[3] / 2])
            size = box[2:4]
            avg = jnp.mean(image.astype(jnp.float32), axis=(0, 1))
            crop_sz = jnp.sqrt(jnp.prod(size)) * self.area_scale

            crop = crop_subwindow(image, center, crop_sz, self.P,
                                  avg)
            aug = disc.augment_init_samples(crop)
            feats = jax.vmap(self.feature_fn)(aug) * window  # [A,S,S,C]

            proj0 = disc.pca_projection(feats, self.cdim)
            sigma = label_sigma(size, crop_sz)
            y = disc.gaussian_label(
                (S, S), jnp.array([(S - 1) / 2.0, (S - 1) / 2.0]),
                sigma)
            labels0 = jnp.broadcast_to(y, feats.shape[:1] + (S, S))

            # Joint factorized optimization {filter, projection}
            # (reference eco.py:150-156).
            filt0 = jnp.zeros((self.fsz, self.fsz, self.cdim))

            def residual(p):
                resp = disc.correlate(feats @ p["proj"], p["filt"])
                return {
                    "data": (resp - labels0)
                    / jnp.sqrt(1.0 * feats.shape[0]),
                    "reg_f": jnp.sqrt(self.filter_reg) * p["filt"],
                    "reg_p": jnp.sqrt(self.proj_reg)
                    * (p["proj"] - proj0),
                }

            params, _ = gauss_newton_cg(
                residual, {"proj": proj0, "filt": filt0},
                num_gn_iters=self.init_gn_iter,
                num_cg_iters=self.init_cg_iter)
            proj, filt = params["proj"], params["filt"]

            # Memory stores PROJECTED samples (reference re-projects
            # init samples after the joint optimization,
            # eco.py:158-161); the projection is fixed afterwards.
            mem = disc.init_memory(self.K, (S, S, self.cdim),
                                   feats @ proj)
            return EcoState(proj, filt, mem, center, size, avg,
                            jnp.ones((), jnp.int32))

        # The label is recentred on the located target each frame, so
        # every memory sample shares ONE canonical centered label (the
        # reference shifts samples instead, eco.py:224-225 — same
        # alignment, expressed on the sample side).
        y_center = jnp.array([(S - 1) / 2.0, (S - 1) / 2.0])

        @jax.jit
        def step_fn(state: EcoState, image):
            crop_sz = jnp.sqrt(jnp.prod(state.size)) * self.area_scale

            feats3 = jax.vmap(
                lambda s: features(image, state.center, crop_sz * s,
                                   state.avg))(scales)
            resps = disc.correlate(feats3 @ state.proj, state.filt)

            peaks = jnp.max(resps.reshape(len(self.scales), -1), axis=1)
            k = jnp.argmax(peaks)
            resp = resps[k]
            idx = jnp.unravel_index(jnp.argmax(resp), resp.shape)
            disp = (jnp.array([idx[0], idx[1]], jnp.float32)
                    - jnp.array([(S - 1) / 2.0, (S - 1) / 2.0]))
            scale_k = scales[k]
            px = crop_sz * scale_k / S
            center = state.center + disp[::-1] * px
            size = state.size * scale_k

            # Extract the training sample at the NEW center so the
            # target sits at the canonical label position.
            feat_new = features(image, center, crop_sz * scale_k,
                                state.avg) @ state.proj
            mem, _ = disc.update_memory(state.memory, feat_new,
                                        self.lr)

            sigma = label_sigma(size, crop_sz * scale_k)
            label = disc.gaussian_label((S, S), y_center, sigma)
            labels = jnp.broadcast_to(label, (self.K, S, S))

            # CG filter update on the weighted memory every
            # train_skipping frames (reference FilterOptim run).
            def optimize(filt):
                w_s = jnp.sqrt(mem.weights)[:, None, None]

                def residual(f):
                    r = disc.correlate(mem.samples, f)
                    return {"data": (r - labels) * w_s,
                            "reg": jnp.sqrt(self.filter_reg) * f}

                new_f, _ = gauss_newton_cg(residual, filt,
                                           num_gn_iters=1,
                                           num_cg_iters=self.cg_iter)
                return new_f

            filt = jax.lax.cond(
                state.frame % self.train_skipping == 0, optimize,
                lambda f: f, state.filt)

            new_state = EcoState(state.proj, filt, mem, center, size,
                                 state.avg, state.frame + 1)
            box = jnp.concatenate([center - size / 2, size])
            return new_state, (box, peaks[k])

        self.init_fn = init_fn
        self.step_fn = step_fn

    def init(self, image, box):
        self.state = self.init_fn(jnp.asarray(image), np.asarray(box))

    def update(self, image):
        self.state, (box, score) = self.step_fn(self.state,
                                                jnp.asarray(image))
        return np.asarray(box), float(score)
