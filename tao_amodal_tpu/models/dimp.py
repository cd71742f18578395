"""DiMP/ATOM-capability model: online filter classifier + IoUNet.

Capability-parity with the reference's discriminative trackers
(``pytracking/pytracking/tracker/dimp/dimp.py``, ``atom``): a target
classifier whose filter is optimized ONLINE per sequence (the per-frame
"training loop on device", reference ``dimp.py:80-155``), and an
IoU-prediction network used to refine the target box by gradient
ascent on predicted IoU (``refine_target_box``, ``dimp.py:573-632``).

TPU-first:
  * filter optimization uses our pytree Gauss-Newton/CG solvers
    (:mod:`tao_amodal_tpu.ops.optimization`) inside jit — the whole
    online update is one XLA program;
  * IoUNet pooling is the matmul-form PrRoI
    (:func:`tao_amodal_tpu.ops.roi.prroi_pool`) whose exact box-
    coordinate gradients drive the refinement ascent natively via
    jax.grad (the reference needs a hand-written CUDA coordinate
    backward for this).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tao_amodal_tpu.ops.optimization import gauss_newton_cg
from tao_amodal_tpu.ops.roi import prroi_pool
from tao_amodal_tpu.ops.xcorr import xcorr_depthwise


class FilterClassifier(nn.Module):
    """Feature embedding for the online-learned correlation filter."""

    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=self.dtype)(x)
        return nn.relu(x)


class IoUNet(nn.Module):
    """Predict IoU of candidate boxes against the implicit target.

    Reference capability: ATOM/DiMP IoUNet with PrRoI-pooled features
    modulated by a target-conditional vector.
    """

    features: int = 256
    pool_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, target_feat_vec, boxes_xyxy,
                 spatial_scale=1.0):
        """
        Args:
          feat: ``[H, W, C]`` search-frame features.
          target_feat_vec: ``[F]`` modulation vector (from the
            reference template, :meth:`modulation`).
          boxes_xyxy: ``[N, 4]`` candidates in feature coords /
            ``spatial_scale``.

        Returns ``[N]`` predicted IoU — differentiable in the boxes.
        """
        pooled = prroi_pool(feat, boxes_xyxy, out_size=self.pool_size,
                            spatial_scale=spatial_scale)  # [N,p,p,C]
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(self.features, dtype=self.dtype)(x))
        mod = nn.relu(nn.Dense(self.features, dtype=self.dtype,
                               name="mod_proj")(target_feat_vec))
        x = x * mod[None, :]
        x = nn.relu(nn.Dense(self.features, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=self.dtype)(x)[:, 0]

    def modulation(self, feat, box_xyxy, spatial_scale=1.0):
        """Target modulation vector from the reference frame."""
        pooled = prroi_pool(feat, box_xyxy[None],
                            out_size=self.pool_size,
                            spatial_scale=spatial_scale)
        return pooled.reshape(-1)


def train_filter(feats, labels, filter_shape, num_gn_iters=5,
                 num_cg_iters=8, reg=1e-2):
    """Optimize a correlation filter on memory samples — the DiMP
    "model optimizer" as Gauss-Newton/CG on device.

    Args:
      feats: ``[M, H, W, C]`` memory features.
      labels: ``[M, Ho, Wo]`` desired response maps (Gaussians at the
        target), Ho = H - fh + 1.
      filter_shape: ``(fh, fw, C)``.

    Returns the optimized filter ``[fh, fw, C]``.
    """
    fh, fw, C = filter_shape

    def residual(filt):
        resp = xcorr_depthwise(
            feats, jnp.broadcast_to(filt, (feats.shape[0], fh, fw, C)))
        resp = jnp.sum(resp, axis=-1)  # [M, Ho, Wo]
        return {"data": resp - labels,
                "reg": jnp.sqrt(reg) * filt}

    filt0 = jnp.zeros((fh, fw, C))
    filt, losses = gauss_newton_cg(residual, filt0,
                                   num_gn_iters=num_gn_iters,
                                   num_cg_iters=num_cg_iters)
    return filt, losses


def classify(feats, filt):
    """Correlation response of the filter over features
    ``[B, H, W, C]`` -> ``[B, Ho, Wo]``."""
    B = feats.shape[0]
    fh, fw, C = filt.shape
    resp = xcorr_depthwise(
        feats, jnp.broadcast_to(filt, (B, fh, fw, C)))
    return jnp.sum(resp, axis=-1)


def refine_box_ascent(iou_net, variables, feat, mod_vec, box_xyxy,
                      steps=5, step_size=1.0, spatial_scale=1.0):
    """Gradient-ascent box refinement on predicted IoU
    (reference ``refine_target_box`` capability), as a fori_loop.

    Box parameterized (cx, cy, log w, log h) so the ascent is
    scale-equivariant; gradients flow through the PrRoI weights.
    """

    def to_param(b):
        w = b[2] - b[0]
        h = b[3] - b[1]
        return jnp.array([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2,
                          jnp.log(w), jnp.log(h)])

    def to_box(p):
        w = jnp.exp(p[2])
        h = jnp.exp(p[3])
        return jnp.array([p[0] - w / 2, p[1] - h / 2,
                          p[0] + w / 2, p[1] + h / 2])

    def iou_of(p):
        return iou_net.apply(variables, feat, mod_vec,
                             to_box(p)[None],
                             spatial_scale=spatial_scale)[0]

    grad_fn = jax.grad(iou_of)

    def body(_, p):
        g = grad_fn(p)
        scale = jnp.array([jnp.exp(p[2]), jnp.exp(p[3]), 1.0, 1.0])
        return p + step_size * g * scale

    p = jax.lax.fori_loop(0, steps, body, to_param(box_xyxy))
    return to_box(p), iou_of(p)
