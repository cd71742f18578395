"""Preprocessing kernel tests: XLA reference vs interpreted Pallas."""

import numpy as np
import jax
import jax.numpy as jnp

from tao_amodal_tpu.ops.pallas.preproc import (
    make_letterbox_weights,
    preprocess_clip,
    preprocess_frames_pallas,
    preprocess_frames_xla,
)


def test_letterbox_matches_jax_image_resize():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, 100, 160, 3), np.uint8)
    out, scale = preprocess_clip(img, out_size=128, mean=(0, 0, 0),
                                 std=(1, 1, 1), use_pallas=False)
    # Aspect-preserving: 160 -> 128, so 100 -> 80 rows; rows >= 80 pad.
    assert abs(scale - 0.8) < 1e-6
    out = np.asarray(out)
    assert np.abs(out[0, 82:]).max() == 0.0  # letterbox zero pad

    # Oracle: plain bilinear sampling at half-pixel centers (our
    # convention == cv2 INTER_LINEAR; note jax.image.resize
    # anti-aliases on downscale, a different valid convention).
    f = img[0].astype(np.float64)
    ys = (np.arange(80) + 0.5) / 0.8 - 0.5
    xs = (np.arange(128) + 0.5) / 0.8 - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, 99)
    x0 = np.clip(np.floor(xs).astype(int), 0, 159)
    y1 = np.minimum(y0 + 1, 99)
    x1 = np.minimum(x0 + 1, 159)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    ref = ((1 - wy) * ((1 - wx) * f[y0][:, x0]
                       + wx * f[y0][:, x1])
           + wy * ((1 - wx) * f[y1][:, x0] + wx * f[y1][:, x1]))
    np.testing.assert_allclose(out[0, :80], ref, atol=0.5)


def test_pallas_matches_xla_interpret():
    from unittest import mock

    from jax.experimental import pallas as pl

    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.randint(0, 255, (2, 64, 96, 3), np.uint8))
    wy, wx, _ = make_letterbox_weights((64, 96), 128)
    mean = jnp.asarray([10.0, 20.0, 30.0])
    std = jnp.asarray([2.0, 3.0, 4.0])

    exp = np.asarray(preprocess_frames_xla(frames, wy, wx, mean, std))

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig_call(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = np.asarray(preprocess_frames_pallas(
            frames, wy, wx, mean, std, out_size=128))
    np.testing.assert_allclose(got, exp, atol=1e-3)


def test_normalization_applied():
    img = np.full((1, 32, 32, 3), 100, np.uint8)
    out, _ = preprocess_clip(img, out_size=32, mean=(100, 100, 100),
                             std=(10, 10, 10), use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_prroi_pallas_matches_xla():
    """Pallas PrRoI (interpret mode) vs the XLA einsum form."""
    from tao_amodal_tpu.ops.pallas.prroi import prroi_pool_pallas
    from tao_amodal_tpu.ops.roi import prroi_pool

    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(32, 32, 128).astype(np.float32))
    rois = jnp.asarray(
        np.stack([rng.uniform(0, 12, 8), rng.uniform(0, 12, 8),
                  rng.uniform(16, 30, 8), rng.uniform(16, 30, 8)],
                 axis=1).astype(np.float32))
    exp = np.asarray(prroi_pool(feat, rois, out_size=7))
    got = np.asarray(prroi_pool_pallas(feat, rois, out_size=7,
                                       block_r=4, interpret=True))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)
