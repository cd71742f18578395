"""Cross-correlation between template and search features.

The Siamese-tracker primitive (capability of reference
``pysot/core/xcorr.py:12-48``): correlate per-sample template kernels
over search feature maps.  On TPU this is exactly a grouped
``lax.conv_general_dilated`` — the batch folds into the channel axis and
``feature_group_count`` does the per-sample/per-channel grouping, which
XLA lowers straight onto the MXU.  No Python loops, no per-sample conv
calls.

Layout: NHWC (TPU-preferred).  ``x`` is the search feature
``[B, Hx, Wx, C]``; ``kernel`` the template feature ``[B, Hz, Wz, C]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xcorr_depthwise(x, kernel):
    """Per-sample, per-channel correlation -> ``[B, Ho, Wo, C]``.

    Equivalent to reference ``xcorr_depthwise`` (``xcorr.py:39-48``):
    each (sample, channel) plane of ``kernel`` slides over the matching
    plane of ``x``.
    """
    b, hx, wx, c = x.shape
    _, hz, wz, _ = kernel.shape
    # Fold batch into channels: one conv with B*C groups.
    xr = x.transpose(1, 2, 0, 3).reshape(1, hx, wx, b * c)
    # Filters HWIO with I=1 (depthwise): [Hz, Wz, 1, B*C].
    kr = kernel.transpose(1, 2, 0, 3).reshape(hz, wz, 1, b * c)
    out = jax.lax.conv_general_dilated(
        xr, kr, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
        preferred_element_type=jnp.float32)
    ho, wo = out.shape[1], out.shape[2]
    return out.reshape(ho, wo, b, c).transpose(2, 0, 1, 3)


def xcorr_full(x, kernel):
    """Per-sample full correlation (template as a dense filter bank).

    Equivalent to reference ``xcorr_fast`` / ``xcorr_slow``
    (``xcorr.py:12-37``): output channel dim is 1 per sample.
    """
    b, hx, wx, c = x.shape
    _, hz, wz, _ = kernel.shape
    xr = x.transpose(1, 2, 0, 3).reshape(1, hx, wx, b * c)
    # One filter per sample over that sample's C channels: group=b.
    kr = kernel.transpose(1, 2, 0, 3).reshape(hz, wz, b, c)
    kr = kr.transpose(0, 1, 3, 2).reshape(hz, wz, c, b)
    out = jax.lax.conv_general_dilated(
        xr, kr, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b,
        preferred_element_type=jnp.float32)
    ho, wo = out.shape[1], out.shape[2]
    return out.reshape(ho, wo, b, 1).transpose(2, 0, 1, 3)
