"""RoI pooling tests.

The gold check mirrors the reference CUDA kernel's own unit test
(PreciseRoIPooling/pytorch/tests/test_prroi_pooling2d.py): on integer-
aligned RoIs whose bins cover whole pixels, precise pooling equals plain
average pooling; plus gradient checks for the box-coordinate
derivatives (the capability the CUDA ``PrRoIPoolingCoorBackward``
provides).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tao_amodal_tpu.ops.roi import (
    multilevel_roi_align,
    prroi_pool,
    roi_align,
)


def test_prroi_equals_avg_pool_on_aligned_rois():
    rng = np.random.RandomState(0)
    feat = rng.randn(16, 16, 3).astype(np.float32)
    # RoI [0,0,14,14] with out_size 7 -> each bin is exactly 2x2 pixels.
    # Bin integral of the bilinear surface over a 2x2-pixel-aligned
    # rectangle weights interior pixels fully and boundary pixels by
    # half -- equal to avg pooling only when sampled area is interior;
    # instead verify against direct numerical integration.
    rois = jnp.array([[0.0, 0.0, 14.0, 14.0]])
    out = np.asarray(prroi_pool(jnp.asarray(feat), rois, out_size=7))

    # Numerical integration oracle (vectorized bilinear sampling).
    def bilinear(Y, X):
        y0 = np.floor(Y).astype(int)
        x0 = np.floor(X).astype(int)
        y1 = np.minimum(y0 + 1, 15)
        x1 = np.minimum(x0 + 1, 15)
        wy = (Y - y0)[..., None]
        wx = (X - x0)[..., None]
        return ((1 - wy) * ((1 - wx) * feat[y0, x0] + wx * feat[y0, x1])
                + wy * ((1 - wx) * feat[y1, x0] + wx * feat[y1, x1]))

    n = 60
    for by in range(7):
        for bx in range(7):
            ys = by * 2 + (np.arange(n) + 0.5) * 2 / n
            xs = bx * 2 + (np.arange(n) + 0.5) * 2 / n
            Y, X = np.meshgrid(ys, xs, indexing="ij")
            exp = bilinear(Y, X).mean(axis=(0, 1))
            np.testing.assert_allclose(out[0, by, bx], exp, atol=2e-2)


def test_prroi_coordinate_gradients_match_sampling_oracle():
    """Box-coordinate grads vs an independently differentiable
    dense-sampling estimator of the same integral (finite differences
    are too noisy in float32)."""
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(12, 12, 2).astype(np.float32))

    def sample_pool(roi, n=120, out_size=2):
        x0, y0, x1, y1 = roi
        bw = (x1 - x0) / out_size
        bh = (y1 - y0) / out_size
        u = (jnp.arange(n) + 0.5) / n

        def bil(y, x):
            y0i = jnp.clip(jnp.floor(y), 0, 11).astype(int)
            x0i = jnp.clip(jnp.floor(x), 0, 11).astype(int)
            y1i = jnp.minimum(y0i + 1, 11)
            x1i = jnp.minimum(x0i + 1, 11)
            wy = y - y0i
            wx = x - x0i
            return ((1 - wy)[..., None]
                    * ((1 - wx)[..., None] * feat[y0i, x0i]
                       + wx[..., None] * feat[y0i, x1i])
                    + wy[..., None]
                    * ((1 - wx)[..., None] * feat[y1i, x0i]
                       + wx[..., None] * feat[y1i, x1i]))

        rows = []
        for by in range(out_size):
            row = []
            for bx in range(out_size):
                Y, X = jnp.meshgrid(y0 + by * bh + u * bh,
                                    x0 + bx * bw + u * bw, indexing="ij")
                row.append(bil(Y, X).mean(axis=(0, 1)))
            rows.append(jnp.stack(row))
        return jnp.stack(rows)

    roi = jnp.array([2.3, 1.7, 9.1, 8.4])
    g_ours = jax.grad(
        lambda r: jnp.sum(prroi_pool(feat, r[None], out_size=2) ** 2))(roi)
    g_oracle = jax.grad(lambda r: jnp.sum(sample_pool(r) ** 2))(roi)
    assert np.all(np.isfinite(np.asarray(g_ours)))
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_oracle),
                               rtol=0.1, atol=0.02)


def test_prroi_feature_gradients():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(8, 8, 2).astype(np.float32))
    roi = jnp.array([[1.0, 1.0, 6.0, 6.0]])
    g = jax.grad(lambda f: jnp.sum(prroi_pool(f, roi, out_size=2)))(feat)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.asarray(g).sum() > 0  # weights are a partition of the area


def test_roi_align_constant_map():
    feat = jnp.ones((20, 20, 4)) * 3.5
    rois = jnp.array([[2.0, 2.0, 17.0, 12.0], [0.0, 0.0, 5.0, 5.0]])
    out = roi_align(feat, rois, out_size=5)
    np.testing.assert_allclose(np.asarray(out), 3.5, atol=1e-5)


def test_multilevel_roi_align_levels():
    pyramid = [jnp.full((64 // s, 64 // s, 2), float(i))
               for i, s in enumerate((4, 8, 16, 32))]
    # Small roi -> level 0; image-sized roi -> level 2 (with
    # canonical_size=64).  Rois stay inside the image: PrRoI integrates
    # the actual map (outside contributes zero), matching the CUDA
    # kernel's zero-padding convention.
    # Interior rois (PrRoI attenuates at map borders by design — the
    # bilinear surface decays beyond the outermost pixel centers).
    rois = jnp.array([[4.0, 4.0, 12.0, 12.0], [8.0, 8.0, 56.0, 56.0]])
    out = multilevel_roi_align(pyramid, rois, out_size=2,
                               canonical_size=64.0)
    assert float(out[0].mean()) == 0.0   # level 0
    assert float(out[1].mean()) == 1.0   # level 1


def test_packed_multilevel_matches_per_level():
    """prroi_packed == pool-at-every-level + one-hot select, exactly."""
    import numpy as np
    import jax.numpy as jnp

    from tao_amodal_tpu.ops.roi import multilevel_roi_align

    rs = np.random.RandomState(0)
    strides = (8, 16, 32, 64)
    pyramid = [jnp.asarray(rs.randn(64 * 8 // s, 64 * 8 // s, 32),
                           jnp.float32) for s in strides]
    # Rois spanning all level assignments (small to huge).
    R = 24
    sz = rs.uniform(16, 480, R)
    x0 = rs.uniform(0, 512 - 16, R)
    y0 = rs.uniform(0, 512 - 16, R)
    rois = jnp.asarray(np.stack(
        [x0, y0, np.minimum(x0 + sz, 512), np.minimum(y0 + sz, 512)],
        axis=1), jnp.float32)

    ref = multilevel_roi_align(pyramid, rois, canonical_level=1,
                               strides=strides, method="prroi")
    got = multilevel_roi_align(pyramid, rois, canonical_level=1,
                               strides=strides, method="prroi_packed")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_pallas_matches_xla_einsum_interpret():
    """Round-4 fused kernel == the XLA two-einsum form (both layouts),
    interpret mode (the TPU lowering is measured on-chip in
    experiments/prroi_pallas_v2.py)."""
    from tao_amodal_tpu.ops.pallas.prroi import prroi_packed_fused
    from tao_amodal_tpu.ops.roi import prroi_pool

    rs = np.random.RandomState(3)
    H, W, C, R = 24, 50, 128, 16
    feat = jnp.asarray(rs.rand(H, W, C), jnp.float32)
    rois = np.zeros((R, 4), np.float32)
    rois[:, 0] = rs.rand(R) * (W - 8)
    rois[:, 1] = rs.rand(R) * (H - 8)
    rois[:, 2] = rois[:, 0] + 2 + rs.rand(R) * 12
    rois[:, 3] = rois[:, 1] + 2 + rs.rand(R) * 10
    rois = jnp.asarray(rois)

    ref = np.asarray(prroi_pool(feat, rois, 7, 1.0))
    for wmaj in (True, False):
        out = np.asarray(prroi_packed_fused(feat, rois, 7, wmaj=wmaj,
                                            interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_autodiff_gradients_match_einsum(monkeypatch):
    """custom_vjp backward == autodiff of the separable-matmul form
    in both features and roi coordinates."""
    import tao_amodal_tpu.ops.pallas.prroi as P
    from tao_amodal_tpu.ops.roi import prroi_pool

    orig = P.prroi_packed_fused
    monkeypatch.setattr(
        P, "prroi_packed_fused",
        lambda f, r, out_size=7, wmaj=True, interpret=False,
        pre_transposed=False:
        orig(f, r, out_size=out_size, wmaj=wmaj, interpret=True,
             pre_transposed=pre_transposed))

    rs = np.random.RandomState(4)
    H, W, C, R = 16, 20, 128, 8
    feat = jnp.asarray(rs.rand(H, W, C), jnp.float32)
    rois = np.zeros((R, 4), np.float32)
    rois[:, 0] = rs.rand(R) * (W - 6)
    rois[:, 1] = rs.rand(R) * (H - 6)
    rois[:, 2] = rois[:, 0] + 2 + rs.rand(R) * 4
    rois[:, 3] = rois[:, 1] + 2 + rs.rand(R) * 4
    rois = jnp.asarray(rois)

    g1 = jax.grad(lambda f, r: (P.prroi_packed_autodiff(f, r, 7)
                                ** 2).sum(), argnums=(0, 1))(feat, rois)
    g2 = jax.grad(lambda f, r: (prroi_pool(f, r, 7, 1.0) ** 2).sum(),
                  argnums=(0, 1))(feat, rois)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=1e-2, rtol=1e-3)


def test_multilevel_fused_matches_packed_interpret(monkeypatch):
    """method='prroi_packed_fused' == 'prroi_packed' through the full
    multilevel canvas path."""
    import tao_amodal_tpu.ops.pallas.prroi as P

    orig = P.prroi_packed_fused
    monkeypatch.setattr(
        P, "prroi_packed_fused",
        lambda f, r, out_size=7, wmaj=True, interpret=False,
        pre_transposed=False:
        orig(f, r, out_size=out_size, wmaj=wmaj, interpret=True,
             pre_transposed=pre_transposed))

    rs = np.random.RandomState(5)
    pyramid = [jnp.asarray(rs.rand(s, s, 128), jnp.float32)
               for s in (32, 16, 8, 4)]
    R = 8
    rois = np.zeros((R, 4), np.float32)
    rois[:, 0] = rs.rand(R) * 200
    rois[:, 1] = rs.rand(R) * 200
    rois[:, 2] = rois[:, 0] + 5 + rs.rand(R) * 50
    rois[:, 3] = rois[:, 1] + 5 + rs.rand(R) * 50
    rois = jnp.asarray(rois)

    a = np.asarray(multilevel_roi_align(pyramid, rois,
                                        method="prroi_packed"))
    b = np.asarray(multilevel_roi_align(pyramid, rois,
                                        method="prroi_packed_fused"))
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_fused_pre_transposed_autodiff_matches_xla(monkeypatch):
    """prroi_packed_autodiff_t (w-major canvas): forward == XLA einsum
    on the h-major view, gradients == autodiff of the separable form
    (the training path now pools through this variant on TPU)."""
    import tao_amodal_tpu.ops.pallas.prroi as P
    from tao_amodal_tpu.ops.roi import prroi_pool

    orig = P.prroi_packed_fused
    monkeypatch.setattr(
        P, "prroi_packed_fused",
        lambda f, r, out_size=7, wmaj=True, interpret=False,
        pre_transposed=False:
        orig(f, r, out_size=out_size, wmaj=wmaj, interpret=True,
             pre_transposed=pre_transposed))

    rs = np.random.RandomState(6)
    H, Wpad, C, R = 12, 32, 128, 8
    feat_t = jnp.asarray(rs.rand(Wpad, H, C), jnp.float32)
    rois = np.zeros((R, 4), np.float32)
    rois[:, 0] = rs.rand(R) * (Wpad - 8)
    rois[:, 1] = rs.rand(R) * (H - 6)
    rois[:, 2] = rois[:, 0] + 2 + rs.rand(R) * 5
    rois[:, 3] = rois[:, 1] + 2 + rs.rand(R) * 3
    rois = jnp.asarray(rois)

    out = np.asarray(P.prroi_packed_autodiff_t(feat_t, rois, 7))
    ref = np.asarray(prroi_pool(feat_t.transpose(1, 0, 2), rois, 7,
                                1.0))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    g1 = jax.grad(lambda f, r: (P.prroi_packed_autodiff_t(f, r, 7)
                                ** 2).sum(), argnums=(0, 1))(feat_t,
                                                             rois)
    g2 = jax.grad(
        lambda f, r: (prroi_pool(f.transpose(1, 0, 2), r, 7, 1.0)
                      ** 2).sum(), argnums=(0, 1))(feat_t, rois)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=1e-2, rtol=1e-3)


def test_fused_block_r_fits_vmem_and_grid_matches(monkeypatch):
    """The R-grid blocked path (round-4 VMEM fix) == whole-R.

    The study shape (R=128, 112x(64*256) canvas) measured 19.95 MB of
    scoped VMEM whole-R — over the 16 MB limit — so `_fused_block_r`
    must split it; and the gridded kernel must stay exactly equal to
    the single-block form.
    """
    import tao_amodal_tpu.ops.pallas.prroi as P
    from tao_amodal_tpu.ops.roi import prroi_pool

    # The shape that OOMed on-chip must get a sub-whole block...
    assert P._fused_block_r(128, 112, 64, 256, 7, 2) < 128
    # ...production-small shapes keep the single-block fast path.
    assert P._fused_block_r(96, 112, 64, 256, 7, 2,
                            budget=64 * 2 ** 20) == 96

    # Force blocking at a test-size shape and check equivalence.
    monkeypatch.setattr(P, "_fused_block_r",
                        lambda *a, **k: 6)
    rs = np.random.RandomState(7)
    H, W, C, R = 20, 40, 128, 24
    feat = jnp.asarray(rs.rand(H, W, C), jnp.float32)
    rois = np.zeros((R, 4), np.float32)
    rois[:, 0] = rs.rand(R) * (W - 8)
    rois[:, 1] = rs.rand(R) * (H - 8)
    rois[:, 2] = rois[:, 0] + 2 + rs.rand(R) * 12
    rois[:, 3] = rois[:, 1] + 2 + rs.rand(R) * 10
    rois = jnp.asarray(rois)

    ref = np.asarray(prroi_pool(feat, rois, 7, 1.0))
    for wmaj in (True, False):
        out = np.asarray(P.prroi_packed_fused(
            feat, rois, 7, wmaj=wmaj, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_block_r_legal_and_xla_fallback(monkeypatch):
    """Chooser emits only Mosaic-legal blockings; None -> XLA path.

    A gridded roi block's sublane axis must be a multiple of 8 (or the
    whole axis) or Pallas lowering fails ("divisible by 8 and 128").
    The pre-fix chooser's `br*2<=8` escape returned 4/2/1, which crash
    whenever br < R — observed feeding an UNFOLDED 384x512 clip to the
    detector (16x canvas area vs the s2d-folded serving tensor).
    """
    import tao_amodal_tpu.ops.pallas.prroi as P
    from tao_amodal_tpu.ops.roi import prroi_pool

    # Every choice at a sweep of shapes is whole-R or 8-divisible.
    for R in (8, 16, 24, 96, 128, 100, 12):
        for budget in (2 ** 18, 2 ** 22, 2 ** 24):
            br = P._fused_block_r(R, 112, 64, 256, 7, 2, budget=budget)
            assert br is None or br == R or br % 8 == 0, (R, budget, br)
    # Giant canvas: nothing legal fits -> None (pre-fix returned 4).
    assert P._fused_block_r(96, 1536, 384, 256, 7, 2) is None

    # None must route to the exact XLA separable path, all layouts.
    monkeypatch.setattr(P, "_fused_block_r", lambda *a, **k: None)
    rs = np.random.RandomState(11)
    H, W, C, R = 20, 40, 128, 24
    feat = jnp.asarray(rs.rand(H, W, C), jnp.float32)
    rois = np.zeros((R, 4), np.float32)
    rois[:, 0] = rs.rand(R) * (W - 8)
    rois[:, 1] = rs.rand(R) * (H - 8)
    rois[:, 2] = rois[:, 0] + 2 + rs.rand(R) * 12
    rois[:, 3] = rois[:, 1] + 2 + rs.rand(R) * 10
    rois = jnp.asarray(rois)
    ref = np.asarray(prroi_pool(feat, rois, 7, 1.0))
    for wmaj in (True, False):
        out = np.asarray(P.prroi_packed_fused(
            feat, rois, 7, wmaj=wmaj, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)
    # Pre-transposed w-major canvas [Wpad, H, C], Wpad % 16 == 0.
    Wpad = -(-W // 16) * 16
    feat_t = jnp.pad(feat.transpose(1, 0, 2),
                     ((0, Wpad - W), (0, 0), (0, 0)))
    out = np.asarray(P.prroi_packed_fused(
        feat_t, rois, 7, pre_transposed=True, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)
