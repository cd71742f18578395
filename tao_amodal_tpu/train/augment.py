"""Training augmentations as pure jax (batched, jit/vmap-friendly).

Capability-parity with the reference ``Augmentation``
(``pysot/datasets/augmentation.py:15-100``): shift, scale, color
jitter, grayscale, horizontal flip, blur — expressed as differentiable
/ gather-style array ops so the whole augmentation pipeline fuses into
the training step on device (the reference runs per-sample cv2 on CPU
workers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def shift_scale(image, box_cxcywh, rng, max_shift=64, scale_jitter=0.18,
                pad_value=0.0):
    """Random shift + scale of image and box.

    Returns (image', box'). Uses the resize-free coordinate-remap
    gather (same machinery as the tracker crop).
    """
    H, W, _ = image.shape
    r1, r2, r3 = jax.random.split(rng, 3)
    shift = jax.random.uniform(r1, (2,), minval=-max_shift,
                               maxval=max_shift)
    scale = 1.0 + jax.random.uniform(r2, (2,), minval=-scale_jitter,
                                     maxval=scale_jitter)

    ys = (jnp.arange(H, dtype=jnp.float32) - H / 2) / scale[1] + H / 2 \
        - shift[1]
    xs = (jnp.arange(W, dtype=jnp.float32) - W / 2) / scale[0] + W / 2 \
        - shift[0]
    X, Y = jnp.meshgrid(xs, ys)
    x0 = jnp.floor(X)
    y0 = jnp.floor(Y)
    wx = (X - x0)[..., None]
    wy = (Y - y0)[..., None]

    def fetch(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        return jnp.where(inb[..., None],
                         image[yc, xc].astype(jnp.float32), pad_value)

    out = ((1 - wy) * ((1 - wx) * fetch(y0, x0) + wx * fetch(y0, x0 + 1))
           + wy * ((1 - wx) * fetch(y0 + 1, x0)
                   + wx * fetch(y0 + 1, x0 + 1)))

    cx = (box_cxcywh[0] - W / 2 + shift[0] * 1.0) * scale[0] + W / 2
    cy = (box_cxcywh[1] - H / 2 + shift[1] * 1.0) * scale[1] + H / 2
    new_box = jnp.stack([cx, cy, box_cxcywh[2] * scale[0],
                         box_cxcywh[3] * scale[1]])
    del r3
    return out, new_box


def color_jitter(image, rng, strength=0.1):
    """Per-channel multiplicative jitter (reference color aug uses an
    RGB covariance; a diagonal jitter keeps the same capability)."""
    factors = 1.0 + jax.random.uniform(rng, (3,), minval=-strength,
                                       maxval=strength)
    return image * factors[None, None, :]


def grayscale(image, rng, prob=0.05):
    g = jnp.sum(image * jnp.asarray([0.299, 0.587, 0.114]), axis=-1,
                keepdims=True)
    gray = jnp.broadcast_to(g, image.shape)
    return jnp.where(jax.random.uniform(rng, ()) < prob, gray, image)


def hflip(image, box_cxcywh, rng, prob=0.5):
    W = image.shape[1]
    do = jax.random.uniform(rng, ()) < prob
    flipped = image[:, ::-1, :]
    fbox = box_cxcywh.at[0].set(W - 1 - box_cxcywh[0])
    return (jnp.where(do, flipped, image),
            jnp.where(do, fbox, box_cxcywh))


def blur(image, rng, prob=0.18):
    """3x3 box blur with probability ``prob``."""
    k = jnp.ones((3, 3, 1, 1)) / 9.0
    c = image.shape[-1]
    blurred = jax.lax.conv_general_dilated(
        image[None].transpose(0, 3, 1, 2).reshape(c, 1,
                                                  *image.shape[:2]),
        k.transpose(3, 2, 0, 1), (1, 1), "SAME")
    blurred = blurred.reshape(c, *image.shape[:2]).transpose(1, 2, 0)
    return jnp.where(jax.random.uniform(rng, ()) < prob, blurred, image)


@partial(jax.jit, static_argnames=())
def augment_pair(template, search, search_box, rng):
    """Full augmentation for one (template, search, box) sample."""
    r = jax.random.split(rng, 6)
    search, search_box = shift_scale(search, search_box, r[0])
    search, search_box = hflip(search, search_box, r[1])
    search = color_jitter(search, r[2])
    search = grayscale(search, r[3])
    search = blur(search, r[4])
    template = color_jitter(template, r[5])
    return template, search, search_box
