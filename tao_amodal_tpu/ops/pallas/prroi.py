"""Pallas PrRoI pooling: fused weights + double matmul in VMEM.

The XLA formulation (:func:`tao_amodal_tpu.ops.roi.prroi_pool`)
materializes the ``[R, out, W, C]`` intermediate in HBM (~58 MB per
P3-level frame at R=128).  This kernel keeps everything on-chip: each
grid step owns a block of RoIs, builds the per-axis hat-integral
weights in-register from the RoI scalars, and runs both contractions
against the VMEM-resident feature map — zero HBM intermediates.

Forward-only (inference hot path); training uses the autodiff-friendly
XLA form.  Equivalence is tested in interpret mode against the XLA
implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat_antideriv(u):
    u = jnp.clip(u, -1.0, 1.0)
    return jnp.where(u <= 0, 0.5 * (u + 1.0) ** 2,
                     0.5 + u - 0.5 * u ** 2)


def _kernel(rois_ref, feat_ref, out_ref, *, out_size, block_r):
    """One block of RoIs against the whole (VMEM) feature map.

    rois_ref: ``[block_r, 4]`` xyxy (feature coords) in VMEM.
    feat_ref: ``[H, W, C]`` in VMEM.
    out_ref:  ``[block_r, out, out, C]``.
    """
    H, W, C = feat_ref.shape
    feat = feat_ref[:]

    rois = rois_ref[:]
    x0 = rois[:, 0]
    y0 = rois[:, 1]
    bw = jnp.maximum((rois[:, 2] - x0) / out_size, 1e-8)  # [B]
    bh = jnp.maximum((rois[:, 3] - y0) / out_size, 1e-8)

    # Mosaic supports only 2-D iota: build [out, 1] and [1, n] index
    # planes, broadcast arithmetic handles the rest.
    bins = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, 1), 0).astype(jnp.float32)

    def axis_weights(lo0, step, n):
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (1, n), 1).astype(jnp.float32)
        lo = (lo0[:, None, None]
              + bins[None] * step[:, None, None])   # [B, out, 1]
        hi = lo + step[:, None, None]
        return (_hat_antideriv(hi - idx[None])
                - _hat_antideriv(lo - idx[None]))   # [B, out, n]

    wy = axis_weights(y0, bh, H).astype(feat.dtype)
    wx = axis_weights(x0, bw, W).astype(feat.dtype)

    # Per-roi double contraction via a fori_loop of 2-D MXU matmuls
    # (Mosaic's reshape/contract support is 2-D-centric; the loop body
    # stays entirely in VMEM/registers).
    feat2d = feat.reshape(H, W * C)

    # Static unroll over the roi block (dynamic_slice of VMEM values
    # is not lowerable; static indices are free).
    for i in range(block_r):
        # tmp[out, W*C] = wy_i[out, H] @ feat[H, W*C]
        tmp = jnp.dot(wy[i], feat2d,
                      preferred_element_type=jnp.float32)
        # out[x, out_y*C] = wx_i[out, W] @ tmp_wyc[W, out_y*C]
        tmp_wyc = tmp.reshape(out_size, W, C).transpose(1, 0, 2)
        tmp2 = tmp_wyc.reshape(W, out_size * C)
        o = jnp.dot(wx[i].astype(jnp.float32), tmp2,
                    preferred_element_type=jnp.float32)
        o = o.reshape(out_size, out_size, C).transpose(1, 0, 2)
        out_ref[i] = o / (bw[i] * bh[i])


def _packed_kernel(rois_ref, feat_ref, out_ref, *, out_size, block_r):
    """Block of RoIs against the packed multilevel canvas.

    The FLOPs-heavy first contraction runs as ONE matmul with
    M = block_r * out_size rows (the per-roi form wastes the MXU at
    M=7); the intermediate lives in VMEM in the feature dtype, so the
    [R, out, W, C] HBM tensor of the XLA form never exists.
    """
    H, W, C = feat_ref.shape
    feat = feat_ref[:]
    rois = rois_ref[:]
    x0 = rois[:, 0]
    y0 = rois[:, 1]
    bw = jnp.maximum((rois[:, 2] - x0) / out_size, 1e-8)
    bh = jnp.maximum((rois[:, 3] - y0) / out_size, 1e-8)

    bins = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, 1), 0).astype(jnp.float32)

    def axis_weights(lo0, step, n):
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (1, n), 1).astype(jnp.float32)
        lo = (lo0[:, None, None]
              + bins[None] * step[:, None, None])   # [B, out, 1]
        hi = lo + step[:, None, None]
        return (_hat_antideriv(hi - idx[None])
                - _hat_antideriv(lo - idx[None]))   # [B, out, n]

    wx = axis_weights(x0, bw, W).astype(feat.dtype)

    # Flat [block_r*out, H] y-weights, built WITHOUT 3-D reshapes
    # (Mosaic layout inference rejects sublane-merging shape casts):
    # broadcast the per-roi scalars to rows via a one-hot matmul,
    # row i belongs to roi i // out_size, bin i % out_size.
    BO = block_r * out_size
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (BO, 1), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (1, block_r), 1)
    onehot = (rows_i // out_size == cols_i).astype(jnp.float32)
    y0_f = jnp.dot(onehot, y0[:, None])          # [BO, 1]
    bh_f = jnp.dot(onehot, bh[:, None])          # [BO, 1]
    bin_f = (rows_i % out_size).astype(jnp.float32)
    idx_h = jax.lax.broadcasted_iota(
        jnp.int32, (1, H), 1).astype(jnp.float32)
    lo = y0_f + bin_f * bh_f                     # [BO, 1]
    hi = lo + bh_f
    wy_flat = (_hat_antideriv(hi - idx_h)
               - _hat_antideriv(lo - idx_h)).astype(feat.dtype)

    # m1[(r,y), (w,c)] = sum_h wy[r,y,h] feat[h,w,c] — ONE matmul with
    # both roi and bin dims riding the MXU's M axis (the per-roi form
    # wastes the MXU at M=7).  Mosaic requires a 32-bit accumulator;
    # the block_r default keeps the f32 intermediate inside the 16 MB
    # scoped-VMEM budget, and it is stored onward in the feature dtype.
    m1 = jnp.dot(wy_flat, feat.reshape(H, W * C),
                 preferred_element_type=jnp.float32).astype(feat.dtype)

    # Second (tiny) contraction per roi: out[y,x,c] = wx[x,:] @ m1[y].
    for i in range(block_r):
        rows = m1[i * out_size:(i + 1) * out_size]  # [out, W*C]
        t = rows.reshape(out_size, W, C).transpose(1, 0, 2)
        o = jnp.dot(wx[i], t.reshape(W, out_size * C),
                    preferred_element_type=jnp.float32)
        o = o.reshape(out_size, out_size, C).transpose(1, 0, 2)
        out_ref[i] = (o / (bw[i] * bh[i])).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("out_size", "block_r", "interpret"))
def prroi_packed_pallas(features, rois, out_size=7, block_r=8,
                        interpret=False):
    """Fused PrRoI over a packed canvas: ``[H, W, C]`` features,
    ``[R, 4]`` rois already in canvas coordinates.

    Returns ``[R, out, out, C]`` in the feature dtype.
    """
    H, W, C = features.shape
    R = rois.shape[0]
    while R % block_r:
        block_r //= 2
    return pl.pallas_call(
        partial(_packed_kernel, out_size=out_size, block_r=block_r),
        out_shape=jax.ShapeDtypeStruct((R, out_size, out_size, C),
                                       features.dtype),
        grid=(R // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, 4), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W, C), lambda r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, out_size, out_size, C),
                               lambda r: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rois.astype(jnp.float32), features)


def _fused_kernel(rois_ref, feat_ref, out_ref, *, out_size, n_long,
                  n_short, wmaj):
    """Fused PrRoI against a flat canvas (round-4 kernel).

    The round-2 ``_packed_kernel``'s second stage pays per-roi
    transposes; this formulation keeps BOTH stages as MXU-friendly
    contractions — stage 1 is a per-bin flat matmul
    ``[R, n_long] @ [n_long, n_short*C]``, stage 2 a single batched
    ``dot_general`` over the roi axis.  At the production shape the
    whole roi set is one block (no R grid) so the intermediate never
    leaves VMEM; larger (R, canvas) shapes run a 1-D grid over roi
    blocks with the canvas block resident (constant index map — Pallas
    skips the re-fetch).  Measured 0.590 ms/clip vs the XLA
    two-einsum's 0.847 at the production 4:3 shape
    (experiments/prroi_pallas_v2.py).

    feat_ref: ``[n_long, n_short*C]`` — the canvas flattened with the
    LONG spatial axis leading (w-major when the canvas is wide).
    out_ref: ``[R, out, out, C]`` (y, x) bin order.
    """
    rois = rois_ref[:]
    x0, y0 = rois[:, 0], rois[:, 1]
    bw = jnp.maximum((rois[:, 2] - x0) / out_size, 1e-8)
    bh = jnp.maximum((rois[:, 3] - y0) / out_size, 1e-8)

    bins = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, 1), 0).astype(jnp.float32)

    def axis_weights(lo0, step, n):
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (1, n), 1).astype(jnp.float32)
        lo = lo0[:, None, None] + bins[None] * step[:, None, None]
        hi = lo + step[:, None, None]
        return (_hat_antideriv(hi - idx[None])
                - _hat_antideriv(lo - idx[None]))   # [R, out, n]

    if wmaj:
        w_long = axis_weights(x0, bw, n_long)       # x rides stage 1
        w_short = axis_weights(y0, bh, n_short)
    else:
        w_long = axis_weights(y0, bh, n_long)       # y rides stage 1
        w_short = axis_weights(x0, bw, n_short)
    inv_area = 1.0 / (bw * bh)

    feat = feat_ref[:]
    R = rois.shape[0]
    C = feat.shape[1] // n_short
    for b in range(out_size):
        m1 = jnp.dot(w_long[:, b, :].astype(feat.dtype), feat,
                     preferred_element_type=jnp.float32)
        m1 = m1.reshape(R, n_short, C)
        o = jax.lax.dot_general(
            w_short, m1, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [R, out, C]
        o = o * inv_area[:, None, None]
        if wmaj:
            out_ref[:, :, b, :] = o.astype(out_ref.dtype)
        else:
            out_ref[:, b, :, :] = o.astype(out_ref.dtype)


def _fused_block_r(R, n_long, n_short, C, out_size, esize,
                   budget=13 * 2 ** 20):
    """Largest roi-block size whose scoped-VMEM footprint fits.

    Whole-R when it fits (the production fast path: one grid step,
    zero block churn); otherwise halve until the resident set — canvas
    block + f32 stage-1 intermediate + double-buffered output block +
    weight planes — is under ``budget`` (16 MB scoped VMEM minus
    headroom for Mosaic temporaries; the R=128/112x16384 study shape
    measured 19.95 MB whole-R, i.e. over the limit).
    """
    feat_b = n_long * n_short * C * esize

    def fits(br):
        per = (br * n_short * C * 4            # m1 (f32 accumulator)
               + 2 * br * out_size * out_size * C * esize   # out x2
               + br * out_size * (n_long + n_short) * 4     # weights
               + br * out_size * C * 4)        # stage-2 f32 output
        return feat_b + per <= budget

    # Mosaic constraint: a gridded block's sublane axis must be a
    # multiple of 8 OR the whole axis — anything else fails lowering
    # ("divisible by 8 and 128" check), so only legal blockings are
    # candidates.  ``None`` = no legal blocking fits scoped VMEM; the
    # caller must take the XLA path.
    legal = [R] + [br for br in range(R - 1, 0, -1)
                   if R % br == 0 and br % 8 == 0]
    for br in legal:
        if fits(br):
            return br
    return None


@partial(jax.jit, static_argnames=("out_size", "wmaj", "interpret",
                                   "pre_transposed"))
def prroi_packed_fused(features, rois, out_size=7, wmaj=True,
                       interpret=False, pre_transposed=False):
    """Fused PrRoI forward over a packed canvas (forward only; use
    :func:`prroi_packed_autodiff` on training paths).

    Args:
      features: ``[H, W, C]`` canvas (h-major, the natural packed
        layout); ``wmaj=True`` transposes to w-major in XLA (the
        transpose fuses with the canvas construction).  With
        ``pre_transposed=True`` the canvas is ALREADY w-major
        ``[Wpad, H, C]`` with Wpad a multiple of 16 — the caller built
        it transposed (see ``multilevel_roi_align``'s fused path), so
        the flat view here is a free reshape and the XLA transpose
        pass (~0.1 ms/clip at the production 4:3 shape) never exists.
      rois: ``[R, 4]`` xyxy in canvas coordinates.

    Returns ``[R, out, out, C]`` in the feature dtype.
    """
    R = rois.shape[0]
    if pre_transposed:
        Wpad, H, C = features.shape
        assert Wpad % 16 == 0, Wpad
        n_long, n_short = Wpad, H
        flat = features.reshape(n_long, H * C)
        wmaj = True
    elif wmaj:
        H, W, C = features.shape
        n_long, n_short = -(-W // 16) * 16, H
        flat = jnp.pad(features.transpose(1, 0, 2),
                       ((0, n_long - W), (0, 0), (0, 0)))
        flat = flat.reshape(n_long, H * C)
    else:
        H, W, C = features.shape
        n_long, n_short = H, -(-W // 16) * 16
        flat = jnp.pad(features, ((0, 0), (0, n_short - W), (0, 0)))
        flat = flat.reshape(H, n_short * C)
    block_r = _fused_block_r(R, n_long, n_short, C, out_size,
                             jnp.dtype(features.dtype).itemsize)
    if block_r is None:
        # No Mosaic-legal roi blocking keeps the resident set inside
        # scoped VMEM (huge canvas and/or R with no 8-divisible
        # factor): take the exact XLA separable-matmul path instead.
        # Only the pre_transposed case is stuck with a w-major canvas
        # (pool with swapped roi axes, transpose the output grid back
        # — bin (y, x) of the h-major pool is bin (x, y) of the
        # w-major one); otherwise the original h-major ``features`` is
        # still in scope — pool it directly, no extra HBM round-trip
        # on exactly the huge-canvas shapes that land here.
        from tao_amodal_tpu.ops.roi import prroi_pool

        if pre_transposed:
            rois_sw = rois[:, jnp.asarray([1, 0, 3, 2])]
            out = prroi_pool(features, rois_sw, out_size, 1.0)
            return out.transpose(0, 2, 1, 3).astype(features.dtype)
        return prroi_pool(features, rois, out_size,
                          1.0).astype(features.dtype)
    return pl.pallas_call(
        partial(_fused_kernel, out_size=out_size, n_long=n_long,
                n_short=n_short, wmaj=wmaj),
        out_shape=jax.ShapeDtypeStruct((R, out_size, out_size, C),
                                       features.dtype),
        grid=(R // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, 4), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_long, n_short * C), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, out_size, out_size, C),
                               lambda r: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rois.astype(jnp.float32), flat)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def prroi_packed_autodiff(features, rois, out_size=7):
    """Pallas-forward PrRoI with exact XLA-einsum gradients.

    The training path differentiates through the separable-matmul
    formulation (:func:`tao_amodal_tpu.ops.roi.prroi_pool` — the true
    analytic derivative in both features and roi coordinates, the
    semantics the reference CUDA kernel hand-codes in
    ``PrRoIPoolingCoorBackward``); the forward runs the fused kernel.
    """
    return prroi_packed_fused(features, rois, out_size=out_size)


def _prroi_autodiff_fwd(features, rois, out_size):
    return (prroi_packed_fused(features, rois, out_size=out_size),
            (features, rois))


def _prroi_autodiff_bwd(out_size, res, g):
    from tao_amodal_tpu.ops.roi import prroi_pool

    features, rois = res
    _, vjp = jax.vjp(
        lambda f, r: prroi_pool(f, r, out_size, 1.0).astype(g.dtype),
        features, rois)
    return vjp(g)


prroi_packed_autodiff.defvjp(_prroi_autodiff_fwd, _prroi_autodiff_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def prroi_packed_autodiff_t(features_t, rois, out_size=7):
    """:func:`prroi_packed_autodiff` for a PRE-TRANSPOSED (w-major)
    canvas ``[Wpad, H, C]`` (Wpad a multiple of 16).

    Forward runs the fused kernel with a free flat view; backward
    differentiates the exact XLA separable-matmul form over the
    h-major view (the transpose is autodiff-transparent, so feature
    gradients come back w-major as the caller laid them out).
    """
    return prroi_packed_fused(features_t, rois, out_size=out_size,
                              pre_transposed=True)


def _prroi_autodiff_t_fwd(features_t, rois, out_size):
    return (prroi_packed_fused(features_t, rois, out_size=out_size,
                               pre_transposed=True),
            (features_t, rois))


def _prroi_autodiff_t_bwd(out_size, res, g):
    from tao_amodal_tpu.ops.roi import prroi_pool

    features_t, rois = res
    _, vjp = jax.vjp(
        lambda ft, r: prroi_pool(ft.transpose(1, 0, 2), r, out_size,
                                 1.0).astype(g.dtype),
        features_t, rois)
    return vjp(g)


prroi_packed_autodiff_t.defvjp(_prroi_autodiff_t_fwd,
                               _prroi_autodiff_t_bwd)


@partial(jax.jit, static_argnames=("out_size", "block_r", "interpret"))
def prroi_pool_pallas(features, rois, out_size=7, spatial_scale=1.0,
                      block_r=8, interpret=False):
    """Pallas PrRoI forward.

    Args:
      features: ``[H, W, C]``; C a multiple of 128 for clean tiling.
      rois: ``[R, 4]`` xyxy image coords; R a multiple of ``block_r``.

    Returns ``[R, out_size, out_size, C]`` float32.
    """
    H, W, C = features.shape
    R = rois.shape[0]
    assert R % block_r == 0, (R, block_r)
    rois = (rois.astype(jnp.float32) * spatial_scale)

    return pl.pallas_call(
        partial(_kernel, out_size=out_size, block_r=block_r),
        out_shape=jax.ShapeDtypeStruct((R, out_size, out_size, C),
                                       jnp.float32),
        grid=(R // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, 4), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W, C), lambda r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, out_size, out_size, C),
                               lambda r: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rois, features)
