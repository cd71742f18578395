"""Fused ResNet bottleneck-chain Pallas kernel (round 4).

The XLA trunk is HBM-bound in its early stages: at the production 4:3
geometry, stage 1 (3 bottlenecks @96x128, C=256) measures 1.47 ms/clip
at ~28% MXU and stage 2 (4 @48x64, C=512) 1.28 ms at ~44% — every
block boundary round-trips its [H, W, C] activation through HBM
(~77 MB/frame for stage 1 alone).  This kernel runs a CHAIN of
stride-1 bottleneck blocks entirely in VMEM: one HBM read of the stage
input, one write of the stage output, all intermediate activations
on-chip.

Replaces (capability-wise) the reference's torch ResNet stages
(``pysot/models/backbone/resnet_atrous.py`` Bottleneck stacks) on the
serving path; the round-2 whole-frame attempt lost to XLA because
un-tiled frames cannot pipeline (BENCH_NOTES round-2 negative results)
— this version tiles ROWS with a halo so Mosaic double-buffers
HBM loads across grid steps.

Design notes:
  * grid = (T, H/S): one (frame, row-tile) per step; S=24 rows.
  * halo: the chain of ``n`` 3x3 convs needs ``n`` extra rows each
    side.  Instead of manual DMA, the input is passed THREE times with
    clamped block index maps (prev/cur/next row tile) — Mosaic
    pipelines plain BlockSpec loads, and the assembled scratch tile
    carries zero rows at the frame edges (SAME-pad semantics).
  * inference-mode BatchNorm is folded into the conv weights host-side
    (:func:`fold_convbn`), so each conv is matmul+bias.
  * 3x3 convs run as 3 row-taps of a column-im2col matmul
    ([rows*W, 3C] @ [3C, C] per tap) — K >= 192 keeps the MXU fed.
  * every dot accumulates f32 (``preferred_element_type``) and is cast
    back to the activation dtype immediately, bounding VMEM pressure.
  * gradients: :func:`fused_bottleneck_chain` carries a custom VJP
    whose backward differentiates :func:`bottleneck_chain_reference`
    (the exact same math as XLA convs) — the fused kernel is
    forward-only, training cost is unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_convbn(kernel, scale, bias, mean, var, eps=1e-5):
    """Fold inference BatchNorm into the preceding conv.

    Args:
      kernel: ``[kh, kw, Cin, Cout]`` conv kernel (HWIO).
      scale/bias/mean/var: ``[Cout]`` BN params/stats.

    Returns ``(folded_kernel, folded_bias)`` — f32.
    """
    s = (scale / jnp.sqrt(var + eps)).astype(jnp.float32)
    w = kernel.astype(jnp.float32) * s
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return w, b


def _block_param_arrays(p, dtype):
    """Normalize one folded block-param dict into kernel operands.

    Input dict keys: ``wa [1,1,Cin,M]/[Cin,M]``, ``ba [M]``,
    ``w3 [3,3,M,M]``, ``b3 [M]``, ``wb [M,4M]``, ``bb [4M]``,
    optional ``wd [Cin,4M]``, ``bd [4M]``.
    Returns a flat list of arrays: wa, ba, w3m, w3z, w3p, b3, wb, bb
    (+ wd, bd when present); weight matrices in ``dtype``, biases f32
    shaped [1, C] (2-D for TPU layout).
    """
    def mat(w):
        w = jnp.asarray(w)
        if w.ndim == 4:  # [1,1,Cin,Cout]
            w = w.reshape(w.shape[-2], w.shape[-1])
        return w.astype(dtype)

    def vec(b):
        return jnp.asarray(b, jnp.float32).reshape(1, -1)

    w3 = jnp.asarray(p["w3"])  # [3,3,M,M] HWIO
    M = w3.shape[-1]
    taps = [w3[dy].reshape(3 * w3.shape[2], M).astype(dtype)
            for dy in range(3)]  # ky=0 <-> dy=-1
    out = [mat(p["wa"]), vec(p["ba"]), taps[0], taps[1], taps[2],
           vec(p["b3"]), mat(p["wb"]), vec(p["bb"])]
    if "wd" in p:
        out += [mat(p["wd"]), vec(p["bd"])]
    return out


def bottleneck_chain_reference(x, params):
    """Exact XLA reference for the fused chain (also the VJP body).

    Args:
      x: ``[T, H, W, Cin]``.
      params: list of folded block dicts (see
        :func:`_block_param_arrays`); every block stride 1, block 0 may
        carry a ``wd/bd`` projection shortcut.
    """
    dt = x.dtype
    cur = x
    for p in params:
        wa = jnp.asarray(p["wa"])
        if wa.ndim == 2:
            wa = wa[None, None]
        a = jax.nn.relu(
            jax.lax.conv_general_dilated(
                cur, wa.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            + jnp.asarray(p["ba"], jnp.float32)).astype(dt)
        h = jax.nn.relu(
            jax.lax.conv_general_dilated(
                a, jnp.asarray(p["w3"]).astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            + jnp.asarray(p["b3"], jnp.float32)).astype(dt)
        wb = jnp.asarray(p["wb"])
        if wb.ndim == 2:
            wb = wb[None, None]
        b = (jax.lax.conv_general_dilated(
                h, wb.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
             + jnp.asarray(p["bb"], jnp.float32))
        if "wd" in p:
            wd = jnp.asarray(p["wd"])
            if wd.ndim == 2:
                wd = wd[None, None]
            res = (jax.lax.conv_general_dilated(
                      cur, wd.astype(dt), (1, 1), "SAME",
                      dimension_numbers=("NHWC", "HWIO", "NHWC"),
                      preferred_element_type=jnp.float32)
                   + jnp.asarray(p["bd"], jnp.float32))
        else:
            res = cur.astype(jnp.float32)
        cur = jax.nn.relu(b + res).astype(dt)
    return cur


def _chain_kernel(prev_ref, cur_ref, next_ref, *rest, S, W, halo,
                  layout, H_total):
    """One (frame, row-tile) step of the fused chain.

    rest = flattened per-block params + out_ref (last).
    layout: list of (has_downsample, n_arrays) per block.
    """
    out_ref = rest[-1]
    params = rest[:-1]
    tile = pl.program_id(1)
    dt = cur_ref.dtype

    rows = S + 2 * halo
    r0 = tile * S  # frame row of the tile's first OUTPUT row

    # Assemble the haloed input tile from the prev/cur/next row blocks
    # (block index maps are edge-clamped, so out-of-frame rows carry
    # stale data — the frame-row mask below zeroes them).
    x = jnp.concatenate(
        [prev_ref[0, S - halo:, :, :], cur_ref[0],
         next_ref[0, :halo, :, :]], axis=0)  # [rows, W, Cin]

    def framed(v, shrink):
        """Zero rows outside the frame.  SAME conv semantics pad every
        conv with ZEROS — but conv(0)+bias+relu != 0, so the halo rows
        a block computes from out-of-frame inputs must be re-zeroed
        before the next block consumes them."""
        n = v.shape[0]
        g = (jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
             + (r0 - halo + shrink))
        return v * ((g >= 0) & (g < H_total)).astype(v.dtype)

    x = framed(x, 0)

    def dg(v, w):
        # [r, W, K] x [K, N] -> [r, W, N] f32
        return jax.lax.dot_general(
            v, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    vr = rows
    i = 0
    for bi, (has_ds, _) in enumerate(layout):
        wa, ba, w3m, w3z, w3p, b3, wb, bb = params[i:i + 8]
        i += 8
        if has_ds:
            wd, bd = params[i:i + 2]
            i += 2
        a = jax.nn.relu(dg(x, wa[:]) + ba[:][None]).astype(dt)
        # The 3x3's zero padding applies at the level of ITS input: a
        # 1x1 conv puts relu(bias) on out-of-frame rows, which must
        # read as zeros to the spatial conv.
        a = framed(a, bi)
        # Column im2col: [vr, W, 3M] = (x[c-1], x[c], x[c+1]).
        M = a.shape[-1]
        zc = jnp.zeros((vr, 1, M), dt)
        left = jnp.concatenate([zc, a[:, :W - 1, :]], axis=1)
        right = jnp.concatenate([a[:, 1:, :], zc], axis=1)
        x3 = jnp.concatenate([left, a, right], axis=2)
        # Row taps: out[r] = sum_dy x3[r+dy] @ w3[dy], valid centers.
        h = (dg(x3[:vr - 2], w3m[:]) + dg(x3[1:vr - 1], w3z[:])
             + dg(x3[2:], w3p[:]))
        h = jax.nn.relu(h + b3[:][None]).astype(dt)
        b = dg(h, wb[:]) + bb[:][None]
        core = x[1:vr - 1]
        if has_ds:
            res = dg(core, wd[:]) + bd[:][None]
        else:
            res = core.astype(jnp.float32)
        x = jax.nn.relu(b + res).astype(dt)
        vr -= 2
        if bi + 1 < len(layout):
            x = framed(x, bi + 1)

    out_ref[0] = x


def _fused_chain_forward(x, flat_params, layout, S, interpret=False):
    T, H, W, Cin = x.shape
    n_blocks = len(layout)
    halo = n_blocks
    assert H % S == 0 and S >= halo, (H, S, halo)
    Cout = flat_params[6].shape[-1]  # first block's wb: [M, 4M]

    def xspec(off):
        return pl.BlockSpec(
            (1, S, W, Cin),
            lambda t, i: (t, jnp.clip(i + off, 0, H // S - 1), 0, 0),
            memory_space=pltpu.VMEM)

    pspecs = [pl.BlockSpec(p.shape, lambda t, i, nd=p.ndim: (0,) * nd,
                           memory_space=pltpu.VMEM)
              for p in flat_params]
    return pl.pallas_call(
        partial(_chain_kernel, S=S, W=W, halo=halo, layout=layout,
                H_total=H),
        out_shape=jax.ShapeDtypeStruct((T, H, W, Cout), x.dtype),
        grid=(T, H // S),
        in_specs=[xspec(-1), xspec(0), xspec(+1)] + pspecs,
        out_specs=pl.BlockSpec((1, S, W, Cout),
                               lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, *flat_params)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_chain_op(x, params, layout_key, S):
    layout = [(bool(h), n) for h, n in layout_key]
    flat = []
    for p, (has_ds, _) in zip(params, layout):
        flat += _block_param_arrays(p, x.dtype)
    interpret = not any(d.platform == "tpu" for d in jax.devices())
    return _fused_chain_forward(x, flat, layout, S,
                                interpret=interpret)


def _fused_chain_fwd(x, params, layout_key, S):
    return _fused_chain_op(x, params, layout_key, S), (x, params)


def _fused_chain_bwd(layout_key, S, res, g):
    x, params = res
    _, vjp = jax.vjp(
        lambda xx, pp: bottleneck_chain_reference(xx, pp).astype(
            g.dtype), x, params)
    return vjp(g)


_fused_chain_op.defvjp(_fused_chain_fwd, _fused_chain_bwd)


def _chain_tile_rows(H, W, Cin, M, n_blocks, esize,
                     budget=13 * 2 ** 20, cap=None):
    """Largest row-tile S (divisor of H, >= halo) whose scoped-VMEM
    footprint fits.

    Conservative sum of the resident set at one grid step: the three
    double-buffered haloed input blocks + double-buffered output block
    + the per-block peak (bf16 im2col + f32 pre-residual sums — the
    f32 ``b``/``res`` planes at 4M channels dominate).  The production
    stage-1 shape (96x128xC256, 3 blocks) overflows the 16 MB limit at
    S=24 (~25 MB) and fits at S=8.
    """
    halo = n_blocks
    Cout = 4 * M
    for S in range(min(cap or H, H), halo - 1, -1):
        if H % S:
            continue
        rows = S + 2 * halo
        # The chain's intermediate x widens to Cout after block 0
        # (stage 1 enters at 64ch but runs at 256).
        Cx = max(Cin, Cout)
        f = (6 * S * W * Cin * esize        # prev/cur/next, 2 buffers
             + 2 * S * W * Cout * esize     # out block, 2 buffers
             + rows * W * Cx * esize        # assembled x tile
             + rows * W * M * esize         # a
             + rows * W * 3 * M * esize     # x3 im2col
             + (rows - 2) * W * M * 4       # h (f32)
             + 2 * (rows - 2) * W * Cout * 4)  # b + res (f32)
        if f <= budget:
            return S
    return 0


def fused_bottleneck_chain(x, params, tile_rows=None):
    """Run a chain of stride-1 bottleneck blocks fused in VMEM.

    Args:
      x: ``[T, H, W, Cin]`` stage input.
      params: list of folded per-block dicts with keys
        ``wa/ba/w3/b3/wb/bb`` (+ ``wd/bd`` projection shortcut where the
        block changes width).  Fold BN first via :func:`fold_convbn`.
      tile_rows: UPPER BOUND on rows per grid step — the chooser picks
        the largest divisor of H that is <= this cap AND fits the
        scoped-VMEM estimate (:func:`_chain_tile_rows`); a cap that
        divides nothing (or fits nothing) silently falls back to the
        exact XLA chain.  None = no cap.  When benchmarking a specific
        tiling, check the effective S via ``_chain_tile_rows`` first.

    Returns ``[T, H, W, 4M]``; differentiable (exact conv gradients via
    the XLA reference chain).

    The VMEM budget in :func:`_chain_tile_rows` is a hand-derived
    model of Mosaic's resident set, validated on the production
    stage-1/2/3 geometries only; if it under-estimates on a new shape
    the failure mode is a hard Mosaic lowering/OOM error, not a
    graceful fallback — validate new shapes on-chip before enabling a
    fused stage in serving configs.
    """
    H, W, Cin = x.shape[1], x.shape[2], x.shape[3]
    halo = len(params)
    M = params[0]["w3"].shape[-1]
    # The prev/cur/next halo assembly needs S >= halo (each neighbor
    # block must contain the full halo).  No fitting divisor -> exact
    # XLA fallback.
    S = _chain_tile_rows(H, W, Cin, M, halo,
                         jnp.dtype(x.dtype).itemsize, cap=tile_rows)
    if S == 0:
        return bottleneck_chain_reference(x, params)
    layout_key = tuple((("wd" in p), 8 + 2 * ("wd" in p))
                       for p in params)
    return _fused_chain_op(x, params, layout_key, S)
