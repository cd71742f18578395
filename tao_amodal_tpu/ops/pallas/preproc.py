"""Fused frame preprocessing: resize -> letterbox pad -> normalize.

The north-star preprocessing kernel (BASELINE.json: "fused Pallas
decode->resize->pad->normalize kernel streaming clips into HBM"; host
JPEG decode stays on CPU, everything after the pixels is device-side).

Formulation: separable bilinear resize is two matmuls —
``out = Wy @ img @ Wx^T`` with hat-function weight matrices — so the
whole preprocess is MXU work.  The Pallas kernel fuses the uint8->f32
conversion, both resize matmuls, the mean/std normalization, and the
letterbox padding into one VMEM-resident pass per frame; the XLA
reference implementation (:func:`preprocess_frames_xla`) computes the
identical function for testing and CPU fallback.

Layout note: channels are moved to the sublane axis (``[3, H, W]``) so
the lane axis is the image width — matmul-friendly tiling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _resize_weights(src, dst, scale):
    """Bilinear weight matrix ``[dst, src]`` for half-pixel centers.

    Matches ``jax.image.resize(method='linear')`` convention: output
    pixel o samples source coordinate ``(o + 0.5) * src/dst / scale`` -
    0.5 (letterbox ``scale`` <= 1 maps the image into the top-left
    region; rows beyond ``dst*scale`` sample out of range and get zero
    weight -> pad value).
    """
    o = np.arange(dst) + 0.5
    src_coord = o / scale - 0.5
    idx = np.arange(src)
    w = np.maximum(0.0, 1.0 - np.abs(src_coord[:, None] - idx[None, :]))
    # Edge handling: clamp (extend border pixels) for in-range rows.
    in_range = (src_coord >= -0.5) & (src_coord <= src - 0.5)
    row_sum = w.sum(axis=1, keepdims=True)
    w = np.where(row_sum > 0, w / np.maximum(row_sum, 1e-8), 0.0)
    w = w * in_range[:, None]
    return w.astype(np.float32)


def make_letterbox_weights(src_hw, dst, dtype=jnp.float32):
    """(Wy [dstH, H], Wx [dstW, W], scale) for aspect-preserving
    letterbox into ``dst x dst`` (int) or ``(dstH, dstW)`` output.

    A rectangular dst matched to the source aspect (e.g. 4:3 video ->
    512x384) avoids burning backbone FLOPs/bandwidth on square padding
    while keeping the same max-side resolution policy."""
    H, W = src_hw
    dst_h, dst_w = (dst, dst) if isinstance(dst, int) else dst
    scale = min(dst_h / H, dst_w / W)
    wy = _resize_weights(H, dst_h, scale)
    wx = _resize_weights(W, dst_w, scale)
    return jnp.asarray(wy, dtype), jnp.asarray(wx, dtype), scale


def preprocess_frames_xla(frames, wy, wx, mean, std):
    """Reference implementation: ``[T, H, W, 3] uint8`` ->
    ``[T, S, S, 3] float32`` letterboxed + normalized."""
    f = frames.astype(jnp.float32)
    tmp = jnp.einsum("oh,thwc->towc", wy, f)
    out = jnp.einsum("pw,towc->topc", wx, tmp)
    return (out - mean) / std


def _preproc_kernel(frame_ref, wy_ref, wx_ref, mean_ref, std_ref,
                    out_ref):
    """One frame, one channel per grid step: fused resize+normalize.

    Blocks: frame ``[H, W]`` (one channel plane), wy ``[S, H]``,
    wx ``[S, W]`` all VMEM-resident; two MXU dots; scalar mean/std from
    SMEM.
    """
    # Mosaic has no direct uint8->f32 cast; hop through int32.
    f = frame_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
    tmp = jnp.dot(wy_ref[:], f, preferred_element_type=jnp.float32)
    out = jnp.dot(tmp, wx_ref[:].T, preferred_element_type=jnp.float32)
    mean = mean_ref[0, 0, 0]
    std = std_ref[0, 0, 0]
    out_ref[0, 0] = (out - mean) / std


@partial(jax.jit, static_argnames=("out_size",))
def preprocess_frames_pallas(frames, wy, wx, mean, std, out_size=512):
    """Pallas path: grid over (frame, channel); each program does the
    fused per-plane resize+normalize with both matmuls on the MXU.

    Args:
      frames: ``[T, H, W, 3]`` uint8.
      wy/wx: letterbox weight matrices ``[S, H]`` / ``[S, W]``.
      mean/std: ``[3]`` per-channel normalization.

    Returns ``[T, S, S, 3]`` float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H, W, C = frames.shape
    S_h, S_w = ((out_size, out_size) if isinstance(out_size, int)
                else out_size)
    planes = frames.transpose(0, 3, 1, 2)  # [T, C, H, W]
    mean2 = jnp.asarray(mean, jnp.float32).reshape(C, 1, 1)
    std2 = jnp.asarray(std, jnp.float32).reshape(C, 1, 1)

    out = pl.pallas_call(
        _preproc_kernel,
        out_shape=jax.ShapeDtypeStruct((T, C, S_h, S_w), jnp.float32),
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda t, c: (t, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_h, H), lambda t, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_w, W), lambda t, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda t, c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda t, c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, S_h, S_w),
                               lambda t, c: (t, c, 0, 0),
                               memory_space=pltpu.VMEM),
    )(planes, wy, wx, mean2, std2)
    return out.transpose(0, 2, 3, 1)


def space_to_depth(x, block=4):
    """``[..., H, W, C] -> [..., H/b, W/b, C*b*b]`` (stem layout).

    Channel order: (c, by, bx) with c slowest — chosen so the fused
    Pallas preproc (which processes one source channel per grid step)
    can write its 16 sub-channels as one contiguous block.  Stem conv
    weights are defined in this order; any producer must match.
    """
    *lead, h, w, c = x.shape
    b = block
    x = x.reshape(*lead, h // b, b, w // b, b, c)
    # [..., h/b, by, w/b, bx, c] -> [..., h/b, w/b, c, by, bx]
    x = jnp.moveaxis(x, (-4, -2), (-2, -1))
    return x.reshape(*lead, h // b, w // b, c * b * b)


def preprocess_frames_xla_s2d(frames, wy, wx, mean, std, block=4,
                              compute_dtype=jnp.float32):
    """Fused resize + normalize + s2d fold as TWO MATMULS.

    TPU-first trick: the space-to-depth fold rides the resize for
    free — reshaping the resize weight matrix ``Wy [S, H]`` to
    ``[S/b, b, H]`` makes sub-channel (by, bx) of output cell (y, x)
    exactly ``Wy[y*b+by] . img . Wx[x*b+bx]``, so the einsum emits the
    canonical (c, by, bx)-ordered ``[T, S/b, S/b, b*b*C]`` tensor with
    no transpose on the hot path.  Measured 0.09 ms / 16-frame 512^2
    clip on v5e (vs 0.16 ms for a Pallas per-plane kernel + XLA fold).

    Normalization happens AFTER the resize (same semantics as
    :func:`preprocess_frames_xla`): letterbox padding rows have
    all-zero resize weights, so pad cells equal ``-mean/std``.
    """
    T, H, W, C = frames.shape
    b = block
    s_h, s_w = wy.shape[0] // b, wx.shape[0] // b
    dt = compute_dtype
    wy_b = wy.reshape(s_h, b, H).astype(dt)
    wx_b = wx.reshape(s_w, b, W).astype(dt)
    # compute_dtype=bfloat16 (the bf16-trunk serving path): uint8
    # pixels are exact in bf16 (integers <= 256), the resize weights
    # round to ~3 decimal digits, and the matmuls accumulate in f32 on
    # the MXU — halves every intermediate's HBM traffic vs f32.
    f = frames.astype(dt)
    tmp = jnp.einsum("ybh,thwc->tybwc", wy_b, f,
                     preferred_element_type=jnp.float32).astype(dt)
    out = jnp.einsum("xaw,tybwc->tyxcba", wx_b, tmp,
                     preferred_element_type=jnp.float32)
    out = out.reshape(T, s_h, s_w, C * b * b)
    # Per-channel mean/std repeated over the (by, bx) sub-channels.
    mean_b = jnp.repeat(jnp.asarray(mean, jnp.float32), b * b)
    std_b = jnp.repeat(jnp.asarray(std, jnp.float32), b * b)
    return ((out - mean_b) / std_b).astype(dt)


def preprocess_clip(frames, out_size=512,
                    mean=(123.675, 116.28, 103.53),
                    std=(58.395, 57.12, 57.375), use_pallas=None):
    """End-user API: uint8 clip -> normalized letterboxed tensor.

    Returns (tensor ``[T, S, S, 3]``, scale) where ``scale`` maps
    output coords back to source pixels.
    """
    frames = jnp.asarray(frames)
    T, H, W, _ = frames.shape
    wy, wx, scale = make_letterbox_weights((H, W), out_size)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    if use_pallas is None:
        use_pallas = any(d.platform == "tpu" for d in jax.devices())
    if use_pallas:
        out = preprocess_frames_pallas(frames, wy, wx, mean, std,
                                       out_size=out_size)
    else:
        out = preprocess_frames_xla(frames, wy, wx, mean, std)
    return out, scale


def preprocess_clip_s2d(frames, out_size=512,
                        mean=(123.675, 116.28, 103.53),
                        std=(58.395, 57.12, 57.375), use_pallas=None,
                        compute_dtype=jnp.float32):
    """uint8 clip -> normalized, letterboxed, space-to-depth stem
    tensor ``[T, S/4, S/4, 48]`` in the canonical (c, by, bx) channel
    order (what ``ResNet(stem='s2d_pre')`` consumes).

    Returns (tensor, scale).  The s2d fold is fused into the resize
    matmuls (see :func:`preprocess_frames_xla_s2d`) — the same code is
    the fast path on TPU and the portable path on CPU, so
    ``use_pallas`` is accepted for API symmetry but unused.
    """
    del use_pallas
    frames = jnp.asarray(frames)
    T, H, W, _ = frames.shape
    wy, wx, scale = make_letterbox_weights((H, W), out_size)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return preprocess_frames_xla_s2d(
        frames, wy, wx, mean, std, compute_dtype=compute_dtype), scale
