"""RoI feature extraction: RoIAlign and Precise RoI Pooling.

Replaces the reference's CUDA PrRoIPooling extension
(``pytracking/ltr/external/PreciseRoIPooling/src/
prroi_pooling_gpu_impl.cu``) with a TPU-native formulation.

Key reformulation: PrRoI pooling integrates the bilinearly-interpolated
feature surface over each bin.  The bilinear hat basis is separable, so
the exact integral over a rectangle factors into per-axis weight
vectors:

    pool[bin] = (1/area) * g_y^T  F  g_x

with ``g_x[i] = int_{x0}^{x1} max(0, 1-|x-i|) dx`` (closed form).  The
whole op is therefore two matmuls per (roi, channel-block) — MXU work,
no scatter/gather kernels — and **autodiff through the weights yields
the exact box-coordinate gradients** the CUDA backward hand-codes
(``PrRoIPoolingCoorBackward``), for free.

RoIAlign (detectron2-convention sampling) is the detector path;
PrRoIPool is the IoUNet path (ATOM/DiMP capability).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _hat_antideriv(u):
    """F(u) = integral_{-1}^{u} max(0, 1-|t|) dt, piecewise closed form."""
    u = jnp.clip(u, -1.0, 1.0)
    neg = 0.5 * (u + 1.0) ** 2
    pos = 0.5 + u - 0.5 * u ** 2
    return jnp.where(u <= 0, neg, pos)


def _axis_weights(lo, hi, n):
    """Integral of each pixel's hat over [lo, hi] -> ``[n]`` weights."""
    idx = jnp.arange(n, dtype=lo.dtype)
    return _hat_antideriv(hi - idx) - _hat_antideriv(lo - idx)


@partial(jax.jit, static_argnames=("out_size",))
def prroi_pool(features, rois, out_size=7, spatial_scale=1.0):
    """Precise RoI pooling, batched over rois as two dense matmuls.

    Args:
      features: ``[H, W, C]`` feature map (single image).
      rois: ``[R, 4]`` boxes in xyxy (image coords; scaled by
        ``spatial_scale`` onto the feature grid).
      out_size: output bins per side.

    Returns:
      ``[R, out_size, out_size, C]`` pooled features, differentiable in
      both ``features`` and ``rois``.

    The whole roi batch is two einsums —
    ``[R*out, H] x [H, W*C]`` then a batched ``[out, W] x [W, out*C]``
    — so it runs on the MXU with zero gathers.
    """
    H, W, C = features.shape
    dt = jnp.float32
    rois = rois.astype(dt) * spatial_scale
    x0, y0, x1, y1 = (rois[:, i] for i in range(4))
    bw = jnp.maximum((x1 - x0) / out_size, 1e-8)  # [R]
    bh = jnp.maximum((y1 - y0) / out_size, 1e-8)
    bins = jnp.arange(out_size, dtype=dt)

    def axis_w(lo0, step, n):
        # [R, out, n] hat integrals per bin.
        lo = lo0[:, None] + bins[None, :] * step[:, None]  # [R, out]
        hi = lo + step[:, None]
        idx = jnp.arange(n, dtype=dt)[None, None, :]
        return (_hat_antideriv(hi[..., None] - idx)
                - _hat_antideriv(lo[..., None] - idx))

    wx = axis_w(x0, bw, W).astype(features.dtype)  # [R, out, W]
    wy = axis_w(y0, bh, H).astype(features.dtype)  # [R, out, H]
    # The [R, out, raw_axis, C] intermediate is the op's HBM cost;
    # accumulate in f32 on the MXU but STORE it in the feature dtype,
    # and contract the LONGER spatial axis first so the surviving raw
    # axis is the shorter one (the packed multilevel canvas is wide:
    # W~2H, so W-first halves both the intermediate traffic and the
    # second contraction's K at identical first-matmul FLOPs).
    if W >= H:
        tmp = jnp.einsum("rxw,hwc->rxhc", wx, features,
                         preferred_element_type=jnp.float32)
        tmp = tmp.astype(features.dtype)
        out = jnp.einsum("ryh,rxhc->ryxc", wy, tmp,
                         preferred_element_type=jnp.float32)
    else:
        tmp = jnp.einsum("ryh,hwc->rywc", wy, features,
                         preferred_element_type=jnp.float32)
        tmp = tmp.astype(features.dtype)
        out = jnp.einsum("rxw,rywc->ryxc", wx, tmp,
                         preferred_element_type=jnp.float32)
    return out / (bw * bh)[:, None, None, None]


def prroi_pool_batched(features, rois, roi_batch, out_size=7,
                       spatial_scale=1.0):
    """PrRoI over a batch: ``features [B,H,W,C]``, ``roi_batch [R]``
    selects each roi's image."""
    gathered = features[roi_batch]  # [R,H,W,C]
    pool = jax.vmap(lambda f, r: prroi_pool(f, r[None], out_size,
                                            spatial_scale)[0])
    return pool(gathered, rois)


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio"))
def roi_align(features, rois, out_size=7, spatial_scale=1.0,
              sampling_ratio=2, aligned=True):
    """RoIAlign (detectron2 convention) via bilinear gather.

    Args:
      features: ``[H, W, C]``.
      rois: ``[R, 4]`` xyxy in image coords.
      aligned: subtract the half-pixel offset (detectron2
        ``aligned=True``).

    Returns ``[R, out_size, out_size, C]``.
    """
    H, W, C = features.shape
    rois = rois.astype(features.dtype) * spatial_scale
    offset = 0.5 if aligned else 0.0
    s = sampling_ratio

    def sample_one(roi):
        x0, y0, x1, y1 = roi - offset
        bw = (x1 - x0) / out_size
        bh = (y1 - y0) / out_size
        # Sample grid: out*s points per axis at bin-interior offsets.
        ix = jnp.arange(out_size * s, dtype=features.dtype)
        gx = x0 + (ix + 0.5) * bw / s
        gy = y0 + (ix + 0.5) * bh / s

        def bilinear(y, x):
            y = jnp.clip(y, 0.0, H - 1.0)
            x = jnp.clip(x, 0.0, W - 1.0)
            y0i = jnp.floor(y).astype(jnp.int32)
            x0i = jnp.floor(x).astype(jnp.int32)
            y1i = jnp.minimum(y0i + 1, H - 1)
            x1i = jnp.minimum(x0i + 1, W - 1)
            wy = y - y0i
            wx = x - x0i
            f00 = features[y0i, x0i]
            f01 = features[y0i, x1i]
            f10 = features[y1i, x0i]
            f11 = features[y1i, x1i]
            return ((1 - wy)[..., None] * ((1 - wx)[..., None] * f00
                                           + wx[..., None] * f01)
                    + wy[..., None] * ((1 - wx)[..., None] * f10
                                       + wx[..., None] * f11))

        yy = jnp.repeat(gy, out_size * s).reshape(out_size * s,
                                                  out_size * s)
        xx = jnp.tile(gx, (out_size * s, 1))
        sampled = bilinear(yy, xx)  # [out*s, out*s, C]
        # Mean over each s x s sample block.
        sampled = sampled.reshape(out_size, s, out_size, s, C)
        return sampled.mean(axis=(1, 3))

    return jax.vmap(sample_one)(rois)


def multilevel_roi_align(pyramid, rois, canonical_level=2,
                         canonical_size=224.0, out_size=7,
                         strides=(4, 8, 16, 32), method="prroi"):
    """FPN-style level assignment + per-level RoI pooling.

    TPU notes: static-shape strategies instead of ragged per-level
    lists —

      * ``method='prroi_packed'`` (fastest): concatenate the pyramid
        levels side-by-side into ONE zero-gapped canvas, rescale each
        roi into its assigned level's sub-rectangle, and pool once.
        Exactly equal to per-level pooling: the PrRoI hat weights have
        +-1 pixel support and levels are separated by 2 zero columns,
        so no cross-level bleed, and the per-level op's implicit
        zero-pad edge semantics are preserved.  1x pooling cost vs the
        4x of pool-at-every-level.
      * ``method='prroi'``: pool every roi at EVERY level, one-hot
        select — redundant FLOPs for a single static-shape program.
      * ``method='align'``: sampling RoIAlign.
    """
    areas = jnp.maximum((rois[:, 2] - rois[:, 0])
                        * (rois[:, 3] - rois[:, 1]), 1e-6)
    target = jnp.floor(canonical_level
                       + jnp.log2(jnp.sqrt(areas) / canonical_size + 1e-8))
    target = jnp.clip(target, 0, len(pyramid) - 1).astype(jnp.int32)

    if method in ("prroi_packed", "prroi_packed_pallas",
                  "prroi_packed_fused"):
        # Shelf layout: level 0 fills the left column; smaller levels
        # stack vertically in further columns (2-px zero gaps in both
        # axes — the PrRoI hat weights have +-1 px support, so levels
        # cannot bleed and each keeps its zero-pad edge semantics).
        # For a P3-P6 pyramid this gives a 64x98 canvas instead of the
        # one-row 64x126, cutting first-contraction FLOPs ~22%.
        gap = 2
        H = max(f.shape[0] for f in pyramid)
        offs = []  # (oy, ox) per level
        col_x, col_w, cur_y = 0, pyramid[0].shape[1], 0
        for f in pyramid:
            fh, fw = f.shape[0], f.shape[1]
            if cur_y + fh > H:  # start a new column
                col_x += col_w + gap
                cur_y, col_w = 0, fw
            offs.append((cur_y, col_x))
            col_w = max(col_w, fw)
            cur_y += fh + gap
        C = pyramid[0].shape[-1]
        # Pallas kernel: round the canvas width up to the sublane tile
        # (16 covers both bf16 and f32) so every reshape/transpose in
        # the kernel is layout-legal.  The XLA einsum path needs no
        # such rounding — padding it would just add zero columns to the
        # first contraction's K axis (~12% wasted FLOPs at the 4:3
        # geometry's 98-wide canvas).
        W_canvas = col_x + col_w
        if method == "prroi_packed_pallas":
            W_canvas = -(-W_canvas // 16) * 16
        inv_stride = jnp.asarray([1.0 / s for s in strides],
                                 jnp.float32)[target]       # [R]
        off_y = jnp.asarray([o[0] for o in offs],
                            jnp.float32)[target]            # [R]
        off_x = jnp.asarray([o[1] for o in offs],
                            jnp.float32)[target]            # [R]
        shift = jnp.stack([off_x, off_y, off_x, off_y], axis=1)
        rois_p = rois.astype(jnp.float32) * inv_stride[:, None] + shift
        if method == "prroi_packed_fused":
            # Build the canvas DIRECTLY in the w-major layout the
            # fused kernel contracts (long spatial axis leading,
            # padded to the 16-sublane tile at construction): the
            # per-level transposes fuse into the canvas writes, so the
            # separate whole-canvas XLA transpose pass of the h-major
            # form never exists (~0.1 ms/clip at the 4:3 geometry).
            from tao_amodal_tpu.ops.pallas.prroi import (
                prroi_packed_autodiff_t,
            )

            Wpad = -(-W_canvas // 16) * 16
            packed_t = jnp.zeros((Wpad, H, C), pyramid[0].dtype)
            for f, (oy, ox) in zip(pyramid, offs):
                packed_t = jax.lax.dynamic_update_slice(
                    packed_t, f.transpose(1, 0, 2), (ox, oy, 0))
            return prroi_packed_autodiff_t(packed_t, rois_p, out_size)
        packed = jnp.zeros((H, W_canvas, C), pyramid[0].dtype)
        for f, (oy, ox) in zip(pyramid, offs):
            packed = jax.lax.dynamic_update_slice(
                packed, f, (oy, ox, 0))
        if method == "prroi_packed_pallas":
            from tao_amodal_tpu.ops.pallas.prroi import (
                prroi_packed_pallas,
            )

            return prroi_packed_pallas(packed, rois_p, out_size)
        return prroi_pool(packed, rois_p, out_size, 1.0)

    if method == "prroi_pallas":
        from tao_amodal_tpu.ops.pallas.prroi import prroi_pool_pallas

        def pool(feat, rois, out_size, scale):
            return prroi_pool_pallas(feat, rois, out_size=out_size,
                                     spatial_scale=scale)
    elif method == "prroi":
        pool = prroi_pool
    else:
        pool = roi_align
    pooled = [pool(feat, rois, out_size, 1.0 / stride)
              for feat, stride in zip(pyramid, strides)]
    stacked = jnp.stack(pooled, axis=0)  # [L, R, o, o, C]
    onehot = jax.nn.one_hot(target, len(pyramid), axis=0,
                            dtype=stacked.dtype)  # [L, R]
    return jnp.einsum("lroxc,lr->roxc", stacked, onehot)
