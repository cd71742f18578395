"""Fourier-domain correlation filters (ECO capability).

Capability-parity with the reference's DCF/fourier libraries
(``pytracking/pytracking/libs/{dcf,fourier,complex}.py`` backing the
ECO tracker): FFT-based correlation, gaussian/hann response synthesis,
and a regularized ridge filter update — expressed directly on
``jnp.fft`` (XLA lowers 2-D FFTs natively; no custom complex-pair
plumbing needed).
"""

from __future__ import annotations

import jax.numpy as jnp


def hann2d(shape):
    """Separable 2-D Hann window ``[h, w]``."""
    h, w = shape
    wy = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(h) / (h - 1))
    wx = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(w) / (w - 1))
    return wy[:, None] * wx[None, :]


def gaussian_response(shape, sigma):
    """Centered 2-D gaussian, fftshifted so the peak is at (0, 0)."""
    h, w = shape
    ys = jnp.arange(h) - h // 2
    xs = jnp.arange(w) - w // 2
    g = jnp.exp(-(ys[:, None] ** 2 + xs[None, :] ** 2)
                / (2 * sigma ** 2))
    return jnp.fft.ifftshift(g)


def train_dcf(feats, response, reg=1e-2):
    """Closed-form ridge correlation filter in the Fourier domain.

    Args:
      feats: ``[H, W, C]`` windowed features.
      response: ``[H, W]`` desired response (peak at origin).

    Returns filter hat ``[H, W, C]`` (complex).
    """
    F = jnp.fft.fft2(feats, axes=(0, 1))
    Y = jnp.fft.fft2(response)
    num = jnp.conj(F) * Y[:, :, None]
    den = jnp.sum(F * jnp.conj(F), axis=-1, keepdims=True) + reg
    return num / den


def apply_dcf(feats, filt_hat):
    """Correlate features with a fourier filter -> response ``[H, W]``."""
    F = jnp.fft.fft2(feats, axes=(0, 1))
    R = jnp.sum(F * filt_hat, axis=-1)
    return jnp.real(jnp.fft.ifft2(R))


def update_dcf(filt_hat, feats, response, lr=0.02, reg=1e-2):
    """Running-average model update (ECO-style online adaptation)."""
    new = train_dcf(feats, response, reg)
    return (1 - lr) * filt_hat + lr * new
