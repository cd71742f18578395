"""Fused int8 ResNet bottleneck-stack kernels.

The flagship detector's ResNet-50 trunk is the throughput wall
(BENCH_NOTES.md): XLA runs each conv as a separate HBM round-trip, so
the stages sit far below the compute roofline.  This kernel runs a
whole run of *identity* bottleneck blocks (the 2-5 stride-1 blocks of
each stage) for one frame entirely in VMEM:

  * activations live in HBM as **int8** (half the bf16 traffic), are
    DMA'd in once per frame, and only the final stage output is
    written back;
  * every conv is an int8 x int8 -> int32 MXU dot (1x1 convs are plain
    matmuls; the 3x3 conv is nine shifted matmuls over a zero-padded
    VMEM scratch);
  * BatchNorm (inference) folds into a per-channel f32
    ``scale * acc + bias`` requantization, fused with ReLU and the
    residual add.

Quantization scheme: per-output-channel weight scales x per-tensor
activation scales (PTQ, calibrated offline by
:func:`quantize_bottleneck_params`).  The stride-2 transition block of
each stage stays in XLA (one block per stage; same int math via
:func:`identity_blocks_reference`-style ops) — strided windows don't
tile cleanly in Mosaic and the transition blocks are a small fraction
of stage cost.

Reference parity note: capability of the torch ResNet-50 trunk
(``pysot/models/backbone/resnet_atrous.py`` layer structure); the
quantized execution plan is TPU-native, validated against the f32
trunk by cosine similarity and against the integer reference exactly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QuantBlockParams(NamedTuple):
    """Parameters for a stack of N identity bottlenecks at one stage.

    Shapes (N = number of blocks, C = stage width, M = C // 4):
      w1 ``[N, C, M]`` int8, w2 ``[N, 3, 3, M, M]`` int8,
      w3 ``[N, M, C]`` int8; scale/bias ``[N, *]`` f32 requant vectors
      (BN folded; scale includes the producing activation scale and
      divides by the consuming activation scale so every tensor in HBM
      is int8 at its own calibrated scale).
    """

    w1: jax.Array
    s1: jax.Array  # [N, M]
    b1: jax.Array  # [N, M]
    w2: jax.Array
    s2: jax.Array  # [N, M]
    b2: jax.Array  # [N, M]
    w3: jax.Array
    s3: jax.Array  # [N, C]
    b3: jax.Array  # [N, C]
    res_scale: jax.Array  # [N] f32: input-scale / output-scale


def _rq(acc, scale, bias):
    """int32 accumulator -> int8 with fused scale/bias + ReLU."""
    y = acc.astype(jnp.float32) * scale + bias
    return jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0, 127).astype(
        jnp.int8)


def identity_blocks_reference(x, p: QuantBlockParams):
    """Exact integer-math reference (XLA ops) for the Pallas kernel.

    Args:
      x: ``[T, H, W, C]`` int8.
    Returns ``[T, H, W, C]`` int8.
    """
    N = p.w1.shape[0]
    for i in range(N):
        acc1 = jax.lax.dot_general(
            x.astype(jnp.int32), p.w1[i].astype(jnp.int32),
            (((3,), (0,)), ((), ())))
        y1 = _rq(acc1, p.s1[i], p.b1[i])  # [T, H, W, M]
        y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))
        H, W = x.shape[1], x.shape[2]
        acc2 = jnp.zeros(y1.shape[:3] + (p.w2.shape[-1],), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                win = y1p[:, dy:dy + H, dx:dx + W]
                acc2 = acc2 + jax.lax.dot_general(
                    win.astype(jnp.int32),
                    p.w2[i, dy, dx].astype(jnp.int32),
                    (((3,), (0,)), ((), ())))
        y2 = _rq(acc2, p.s2[i], p.b2[i])
        acc3 = jax.lax.dot_general(
            y2.astype(jnp.int32), p.w3[i].astype(jnp.int32),
            (((3,), (0,)), ((), ())))
        y3 = (acc3.astype(jnp.float32) * p.s3[i] + p.b3[i]
              + x.astype(jnp.float32) * p.res_scale[i])
        x = jnp.clip(jnp.round(jnp.maximum(y3, 0.0)), 0,
                     127).astype(jnp.int8)
    return x


def _stack_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                  b2_ref, w3_ref, s3_ref, b3_ref, rs_ref, o_ref,
                  pad_ref):
    """One frame through N identity bottlenecks, VMEM-resident.

    pad_ref: VMEM scratch ``[H+2, W+2, M]`` int8 for the 3x3 halo.
    """
    H = x_ref.shape[1]
    W = x_ref.shape[2]
    N = w1_ref.shape[0]
    M = w1_ref.shape[2]

    x = x_ref[0]  # [H, W, C] int8

    for i in range(N):  # static unroll over blocks
        acc1 = jax.lax.dot_general(
            x.reshape(H * W, -1), w1_ref[i],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y1 = _rq(acc1, s1_ref[i], b1_ref[i])  # [H*W, M] int8

        # Zero-padded halo in scratch, then nine shifted MXU dots.
        pad_ref[:] = jnp.zeros((H + 2, W + 2, M), jnp.int8)
        pad_ref[1:H + 1, 1:W + 1, :] = y1.reshape(H, W, M)
        acc2 = jnp.zeros((H * W, M), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                win = pad_ref[dy:dy + H, dx:dx + W, :]
                acc2 = acc2 + jax.lax.dot_general(
                    win.reshape(H * W, M), w2_ref[i, dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        y2 = _rq(acc2, s2_ref[i], b2_ref[i])

        acc3 = jax.lax.dot_general(
            y2, w3_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y3 = (acc3.astype(jnp.float32) * s3_ref[i] + b3_ref[i]
              + x.reshape(H * W, -1).astype(jnp.float32)
              * rs_ref[i, 0])
        x = jnp.clip(jnp.round(jnp.maximum(y3, 0.0)), 0,
                     127).astype(jnp.int8).reshape(H, W, -1)

    o_ref[0] = x


@partial(jax.jit, static_argnames=("interpret",))
def identity_blocks_pallas(x, p: QuantBlockParams, interpret=False):
    """Run the identity-bottleneck stack: ``[T, H, W, C] int8`` ->
    ``[T, H, W, C] int8``, one frame per grid step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H, W, C = x.shape
    N, _, M = p.w1.shape
    rs = p.res_scale.reshape(N, 1)

    def spec(shape, smem=False):
        return pl.BlockSpec(
            shape, lambda t: (0,) * len(shape),
            memory_space=pltpu.SMEM if smem else pltpu.VMEM)

    return pl.pallas_call(
        _stack_kernel,
        out_shape=jax.ShapeDtypeStruct((T, H, W, C), jnp.int8),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            spec((N, C, M)), spec((N, M)), spec((N, M)),
            spec((N, 3, 3, M, M)), spec((N, M)), spec((N, M)),
            spec((N, M, C)), spec((N, C)), spec((N, C)),
            spec((N, 1)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, M), jnp.int8),
        ],
        interpret=interpret,
    )(x, p.w1, p.s1, p.b1, p.w2, p.s2, p.b2, p.w3, p.s3, p.b3, rs)


# ---------------------------------------------------------------------
# bf16 fused identity-bottleneck stacks
# ---------------------------------------------------------------------
#
# Same fusion idea as the int8 kernel but at the trunk's native bf16:
# no (re)quantization passes, so the only HBM traffic for an N-block
# identity run is ONE read of the stage input and ONE write of the
# stage output — XLA's per-conv round-trips (y1/y2/y3 per block) are
# what put the trunk at the bandwidth roofline (BENCH_NOTES.md).
# BatchNorm (inference) folds into per-channel f32 scale/bias epilogues
# on the f32 MXU accumulators, which is *more* precise than the flax
# bf16 BN it replaces.


class Bf16BlockParams(NamedTuple):
    """N identity bottlenecks at one stage, BN folded.

    w1 ``[N, C, M]``, w2 ``[N, 3, 3, M, M]``, w3 ``[N, M, C]`` bf16;
    g*/b* f32 per-channel scale/bias (BN running stats folded).
    """

    w1: jax.Array
    g1: jax.Array  # [N, M]
    b1: jax.Array  # [N, M]
    w2: jax.Array
    g2: jax.Array  # [N, M]
    b2: jax.Array  # [N, M]
    w3: jax.Array
    g3: jax.Array  # [N, C]
    b3: jax.Array  # [N, C]


def _bf16_stack_kernel(x_ref, w1_ref, g1_ref, b1_ref, w2_ref, g2_ref,
                       b2_ref, w3_ref, g3_ref, b3_ref, o_ref, pad_ref):
    """One frame through N identity bottlenecks, VMEM-resident (bf16).

    pad_ref: VMEM scratch ``[H+2, W+2, M]`` bf16 for the 3x3 halo.
    """
    H = x_ref.shape[1]
    W = x_ref.shape[2]
    N = w1_ref.shape[0]
    M = w1_ref.shape[2]

    x = x_ref[0]  # [H, W, C] bf16

    for i in range(N):  # static unroll over blocks
        acc1 = jax.lax.dot_general(
            x.reshape(H * W, -1), w1_ref[i],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y1 = jnp.maximum(acc1 * g1_ref[i] + b1_ref[i], 0.0).astype(
            jnp.bfloat16)

        # Zero-padded halo in scratch, then nine shifted MXU dots.
        pad_ref[:] = jnp.zeros((H + 2, W + 2, M), jnp.bfloat16)
        pad_ref[1:H + 1, 1:W + 1, :] = y1.reshape(H, W, M)
        acc2 = jnp.zeros((H * W, M), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                win = pad_ref[dy:dy + H, dx:dx + W, :]
                acc2 = acc2 + jax.lax.dot_general(
                    win.reshape(H * W, M), w2_ref[i, dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y2 = jnp.maximum(acc2 * g2_ref[i] + b2_ref[i], 0.0).astype(
            jnp.bfloat16)

        acc3 = jax.lax.dot_general(
            y2, w3_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y3 = (acc3 * g3_ref[i] + b3_ref[i]
              + x.reshape(H * W, -1).astype(jnp.float32))
        x = jnp.maximum(y3, 0.0).astype(jnp.bfloat16).reshape(H, W, -1)

    o_ref[0] = x


@partial(jax.jit, static_argnames=("interpret", "vmem_limit_mb"))
def identity_blocks_bf16_pallas(x, p: Bf16BlockParams, interpret=False,
                                vmem_limit_mb=None):
    """Run a bf16 identity-bottleneck stack: ``[T, H, W, C] bf16`` ->
    ``[T, H, W, C] bf16``, one frame per grid step.

    ``vmem_limit_mb`` raises Mosaic's 16 MB scoped-VMEM default (v5e
    has 128 MB physical VMEM) for the large-frame stages."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H, W, C = x.shape
    N, _, M = p.w1.shape

    def spec(shape):
        return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kwargs = {}
    if vmem_limit_mb:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024)
    return pl.pallas_call(
        _bf16_stack_kernel,
        out_shape=jax.ShapeDtypeStruct((T, H, W, C), jnp.bfloat16),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            spec((N, C, M)), spec((N, M)), spec((N, M)),
            spec((N, 3, 3, M, M)), spec((N, M)), spec((N, M)),
            spec((N, M, C)), spec((N, C)), spec((N, C)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, M), jnp.bfloat16),
        ],
        interpret=interpret,
        **kwargs,
    )(x.astype(jnp.bfloat16), p.w1, p.g1, p.b1, p.w2, p.g2, p.b2,
      p.w3, p.g3, p.b3)


def identity_blocks_bf16_reference(x, p: Bf16BlockParams):
    """XLA reference computing the identical function (tests/CPU)."""
    T, H, W, C = x.shape
    N = p.w1.shape[0]
    x = x.astype(jnp.bfloat16)
    for i in range(N):
        acc1 = jax.lax.dot_general(
            x.reshape(T, H * W, C), p.w1[i], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y1 = jnp.maximum(acc1 * p.g1[i] + p.b1[i], 0.0).astype(
            jnp.bfloat16).reshape(T, H, W, -1)
        y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc2 = jnp.zeros((T, H * W, p.w2.shape[-1]), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                win = y1p[:, dy:dy + H, dx:dx + W]
                acc2 = acc2 + jax.lax.dot_general(
                    win.reshape(T, H * W, -1), p.w2[i, dy, dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y2 = jnp.maximum(acc2 * p.g2[i] + p.b2[i], 0.0).astype(
            jnp.bfloat16)
        acc3 = jax.lax.dot_general(
            y2, p.w3[i], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y3 = (acc3 * p.g3[i] + p.b3[i]
              + x.reshape(T, H * W, C).astype(jnp.float32))
        x = jnp.maximum(y3, 0.0).astype(jnp.bfloat16).reshape(T, H, W, C)
    return x


def fold_bn(bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Inference BN -> per-channel (scale, bias): y = x*scale + bias."""
    inv = bn_scale / jnp.sqrt(bn_var + eps)
    return inv, bn_bias - bn_mean * inv


def bf16_params_from_bottlenecks(block_vars):
    """Stack flax Bottleneck variable dicts (identity blocks only) into
    :class:`Bf16BlockParams`.

    Args:
      block_vars: list of dicts with ``conv{1,2,3}/kernel`` numpy/jnp
        arrays ([1,1,C,M], [3,3,M,M], [1,1,M,C]) and ``bn{1,2,3}`` as
        (scale, bias, mean, var) tuples.
    """
    cols = {k: [] for k in "w1 g1 b1 w2 g2 b2 w3 g3 b3".split()}
    for bv in block_vars:
        for j, key in ((1, "w1"), (2, "w2"), (3, "w3")):
            k = jnp.asarray(bv[f"conv{j}/kernel"])
            if k.ndim == 4 and k.shape[0] == 1 and k.shape[1] == 1:
                k = k[0, 0]
            g, b = fold_bn(*[jnp.asarray(a, jnp.float32)
                             for a in bv[f"bn{j}"]])
            cols[key].append(k.astype(jnp.bfloat16))
            cols[f"g{j}"].append(g)
            cols[f"b{j}"].append(b)
    return Bf16BlockParams(
        **{k: jnp.stack(v) for k, v in cols.items()})


# ---------------------------------------------------------------------
# Parameter folding: f32 ConvBN weights -> int8 + requant vectors
# ---------------------------------------------------------------------

def _fold_convbn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold inference BatchNorm into conv: returns (kernel', scale,
    bias) with y = conv(x, kernel') * scale + bias equivalent."""
    inv = bn_scale / np.sqrt(bn_var + eps)
    return kernel, inv, bn_bias - bn_mean * inv


def _quant_weight(w, axis):
    """Per-output-channel symmetric int8 quantization."""
    amax = np.max(np.abs(w), axis=axis, keepdims=True)
    s = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return q, s.reshape(-1)


def quantize_bottleneck_params(block_vars, act_scales, in_scale,
                               out_scale):
    """Fold + quantize a list of identity Bottleneck variable dicts.

    Args:
      block_vars: list of per-block dicts with keys
        ``conv1/kernel [1,1,C,M]``, ``conv2/kernel [3,3,M,M]``,
        ``conv3/kernel [1,1,M,C]`` (numpy arrays) and ``bn{1,2,3}``
        as (scale, bias, mean, var) tuples.
      act_scales: list of per-block dicts with calibrated activation
        scales ``{'in': s, 'y1': s, 'y2': s, 'out': s}`` — 'in' of
        block i must equal 'out' of block i-1 (one tensor, one scale).
      in_scale/out_scale: stage input/output activation scales (== the
        first block's 'in' and last block's 'out').

    Returns a :class:`QuantBlockParams` (jnp arrays).
    """
    n = len(block_vars)
    cols = {k: [] for k in ("w1 s1 b1 w2 s2 b2 w3 s3 b3 rs".split())}
    for i, (bv, sc) in enumerate(zip(block_vars, act_scales)):
        s_in = sc["in"]
        k1, g1, c1 = _fold_convbn(bv["conv1/kernel"][0, 0],
                                  *bv["bn1"])  # [C, M]
        q1, sw1 = _quant_weight(k1, axis=0)
        cols["w1"].append(q1)
        cols["s1"].append(s_in * sw1 * g1 / sc["y1"])
        cols["b1"].append(c1 / sc["y1"])

        k2, g2, c2 = _fold_convbn(bv["conv2/kernel"], *bv["bn2"])
        q2, sw2 = _quant_weight(k2, axis=(0, 1, 2))
        cols["w2"].append(q2)
        cols["s2"].append(sc["y1"] * sw2 * g2 / sc["y2"])
        cols["b2"].append(c2 / sc["y2"])

        k3, g3, c3 = _fold_convbn(bv["conv3/kernel"][0, 0],
                                  *bv["bn3"])
        q3, sw3 = _quant_weight(k3, axis=0)
        cols["w3"].append(q3)
        cols["s3"].append(sc["y2"] * sw3 * g3 / sc["out"])
        cols["b3"].append(c3 / sc["out"])
        cols["rs"].append(np.float32(s_in / sc["out"]))

    return QuantBlockParams(
        w1=jnp.asarray(np.stack(cols["w1"])),
        s1=jnp.asarray(np.stack(cols["s1"]), jnp.float32),
        b1=jnp.asarray(np.stack(cols["b1"]), jnp.float32),
        w2=jnp.asarray(np.stack(cols["w2"])),
        s2=jnp.asarray(np.stack(cols["s2"]), jnp.float32),
        b2=jnp.asarray(np.stack(cols["b2"]), jnp.float32),
        w3=jnp.asarray(np.stack(cols["w3"])),
        s3=jnp.asarray(np.stack(cols["s3"]), jnp.float32),
        b3=jnp.asarray(np.stack(cols["b3"]), jnp.float32),
        res_scale=jnp.asarray(np.stack(cols["rs"]), jnp.float32),
    )
