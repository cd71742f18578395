"""Shared machinery for the online discriminative trackers (ATOM/ECO).

Capability-parity with the reference pytracking pieces these trackers
share (``pytracking/pytracking/tracker/{atom/atom.py,eco/eco.py}`` and
``pytracking/features/augmentation.py``):

  * first-frame sample augmentation (identity / flips / shifts / blur),
    reference ``generate_init_samples`` (``eco.py:309-334``,
    ``atom.py`` same name);
  * PCA initialization of the factorized-convolution projection matrix
    (``eco.py:107-111``);
  * the sample-space memory with learning-rate weighting and
    min-weight replacement (``eco.py:337-368``, ``atom.py
    update_memory/update_sample_weights``);
  * advanced localization with hard-negative / target-lost flags
    (``atom.py:338-420 localize_advanced``).

TPU-first design notes: everything is static-shape jax (memory is a
fixed ring with weights, augmentation a fixed stack, the flag logic
branch-free integer codes), so a whole tracker step stays one XLA
program.  Correlation runs as direct MXU convolution instead of the
reference's FFT machinery — on TPU the MXU makes spatial correlation
the fast path, where the reference's Fourier domain exists to make
correlation cheap on CPU/GPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Localization flag codes (reference uses strings
# 'normal'/'not_found'/'uncertain'/'hard_negative').
FLAG_NORMAL = 0
FLAG_NOT_FOUND = 1
FLAG_UNCERTAIN = 2
FLAG_HARD_NEGATIVE = 3


def gaussian_blur(x, sigma=1.0, radius=2):
    """Separable gaussian blur over ``[H, W, C]``."""
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (offs / sigma) ** 2)
    k = k / k.sum()
    xt = jnp.moveaxis(x, -1, 0)  # [C, H, W]
    xt = jax.vmap(lambda c: jnp.apply_along_axis(
        lambda v: jnp.convolve(v, k, mode="same"), 0, c))(xt)
    xt = jax.vmap(lambda c: jnp.apply_along_axis(
        lambda v: jnp.convolve(v, k, mode="same"), 1, c))(xt)
    return jnp.moveaxis(xt, 0, -1)


def augment_init_samples(crop, shifts=(8, -8)):
    """First-frame augmentation stack (reference
    ``generate_init_samples``): identity, horizontal flip, 4 axis
    shifts, blur — a fixed ``[A=7, S, S, 3]`` batch.
    """
    rolls = [jnp.roll(crop, s, axis=ax) for s in shifts for ax in (0, 1)]
    stack = [crop, crop[:, ::-1]] + rolls + [gaussian_blur(crop)]
    return jnp.stack(stack)


def pca_projection(feats, cdim):
    """PCA init of the projection matrix (reference ``eco.py:107-111``:
    SVD of the channel covariance of the init samples).

    Args:
      feats: ``[..., C]`` features (any leading shape).
      cdim: compressed dimension.

    Returns ``P [C, cdim]`` with orthonormal columns.
    """
    x = feats.reshape(-1, feats.shape[-1])
    x = x - x.mean(axis=0, keepdims=True)
    cov = x.T @ x
    # eigh returns ascending eigenvalues; take the top-cdim vectors.
    _, vecs = jnp.linalg.eigh(cov)
    return vecs[:, ::-1][:, :cdim]


class SampleMemory(NamedTuple):
    """Fixed-capacity sample-space memory with reference weighting
    semantics (``eco.py:344-368``)."""

    samples: jax.Array   # [K, ...] stored samples
    weights: jax.Array   # [K]
    prev_ind: jax.Array  # [] int32, -1 = none yet
    num_stored: jax.Array  # [] int32


def init_memory(capacity, sample_shape, init_samples=None,
                dtype=jnp.float32):
    """Create a memory; optionally pre-fill with the (augmented)
    first-frame samples at uniform weight (reference
    ``init_sample_weights = 1/num``)."""
    samples = jnp.zeros((capacity,) + tuple(sample_shape), dtype)
    weights = jnp.zeros((capacity,), jnp.float32)
    if init_samples is not None:
        n = init_samples.shape[0]
        samples = samples.at[:n].set(init_samples.astype(dtype))
        weights = weights.at[:n].set(1.0 / n)
        num = jnp.asarray(n, jnp.int32)
    else:
        num = jnp.zeros((), jnp.int32)
    return SampleMemory(samples, weights, jnp.asarray(-1, jnp.int32),
                        num)


def update_memory(mem: SampleMemory, sample, learning_rate=0.01):
    """Insert a sample with the reference's weight update
    (``update_sample_weights``, ``eco.py:344-368``): replace the
    min-weight slot; renormalize with the learning rate."""
    K = mem.weights.shape[0]
    # Unfilled slots have weight 0 and win argmin, so growth happens
    # before replacement — same as the reference (it argmins over the
    # zero-padded weight vector too).
    r_ind = jnp.argmin(mem.weights)

    def first(w):
        w = jnp.zeros_like(w).at[r_ind].set(1.0)
        return w

    def later(w):
        no_prev = mem.prev_ind < 0
        w_no = w / (1.0 - learning_rate)
        w_no = w_no.at[r_ind].set(learning_rate)
        prev_safe = jnp.maximum(mem.prev_ind, 0)
        w_yes = w.at[r_ind].set(w[prev_safe] / (1.0 - learning_rate))
        return jnp.where(no_prev, w_no, w_yes)

    weights = jax.lax.cond(mem.num_stored == 0, first, later,
                           mem.weights)
    weights = weights / weights.sum()
    samples = mem.samples.at[r_ind].set(
        sample.astype(mem.samples.dtype))
    return SampleMemory(samples, weights,
                        r_ind.astype(jnp.int32),
                        jnp.minimum(mem.num_stored + 1, K)), r_ind


def hann2d(shape):
    h, w = shape
    wy = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * (jnp.arange(h) + 0.5) / h)
    wx = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * (jnp.arange(w) + 0.5) / w)
    return wy[:, None] * wx[None, :]


def gaussian_label(shape, center_rc, sigma):
    """Desired response: gaussian peak at ``center_rc`` (row, col)."""
    h, w = shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    return jnp.exp(-((ys - center_rc[0]) ** 2 + (xs - center_rc[1]) ** 2)
                   / (2 * sigma ** 2))


def correlate(feats, filt):
    """'same' correlation ``[..., H, W, Cc] x [fh, fw, Cc] -> [..., H,
    W]`` summed over channels (the factorized-conv response)."""
    batched = feats.ndim == 4
    x = feats if batched else feats[None]
    fh, fw, cc = filt.shape
    out = jax.lax.conv_general_dilated(
        x, filt[..., None],  # HWIO with O=1
        window_strides=(1, 1),
        padding=[((fh - 1) // 2, fh // 2), ((fw - 1) // 2, fw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out[..., 0]
    return out if batched else out[0]


def localize_advanced(scores, target_sz_cells,
                      target_not_found=0.25,
                      distractor_threshold=0.8,
                      hard_negative_threshold=0.5,
                      displacement_scale=0.8,
                      target_neighborhood_scale=2.2):
    """Hard-negative-aware localization (reference ``atom.py
    localize_advanced``): find the main peak, mask its neighborhood,
    inspect the runner-up, and emit a flag code.

    Args:
      scores: ``[H, W]`` response map.
      target_sz_cells: ``[2]`` (h, w) of the target in score cells.

    Returns (disp_rc ``[2]`` float, max_score, flag int32).
    """
    h, w = scores.shape
    flat_idx = jnp.argmax(scores)
    r1, c1 = jnp.unravel_index(flat_idx, scores.shape)
    max1 = scores[r1, c1]

    nbh = target_neighborhood_scale * target_sz_cells / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    in_nbh = ((jnp.abs(ys - r1) <= nbh[0])
              & (jnp.abs(xs - c1) <= nbh[1]))
    masked = jnp.where(in_nbh, -jnp.inf, scores)
    flat2 = jnp.argmax(masked)
    r2, c2 = jnp.unravel_index(flat2, scores.shape)
    max2 = masked[r2, c2]

    center = jnp.array([(h - 1) / 2.0, (w - 1) / 2.0])
    disp1 = jnp.array([r1, c1], jnp.float32) - center
    disp2 = jnp.array([r2, c2], jnp.float32) - center

    # Reference disparity rule: distractor is 'uncertain' unless the
    # main peak is proportionally much closer to the previous position.
    d1 = jnp.sqrt(jnp.sum(disp1 ** 2))
    d2 = jnp.sqrt(jnp.sum(disp2 ** 2))
    prev_sz = jnp.sqrt(jnp.prod(target_sz_cells))

    not_found = max1 < target_not_found
    distractor = max2 > distractor_threshold * max1
    proximity_ok = d2 > displacement_scale * prev_sz * 0.5
    hard_neg = ((max2 > hard_negative_threshold * max1)
                & jnp.logical_not(distractor))

    flag = jnp.where(
        not_found, FLAG_NOT_FOUND,
        jnp.where(distractor,
                  jnp.where(proximity_ok & (d1 < d2),
                            FLAG_HARD_NEGATIVE, FLAG_UNCERTAIN),
                  jnp.where(hard_neg, FLAG_HARD_NEGATIVE,
                            FLAG_NORMAL))).astype(jnp.int32)
    return disp1, max1, flag
