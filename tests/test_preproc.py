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


def test_s2d_folded_einsum_matches_canonical_fold():
    """Folded-weights s2d preproc == preprocess + space_to_depth,
    including the letterbox-pad normalization semantics."""
    from tao_amodal_tpu.ops.pallas.preproc import (
        preprocess_frames_xla_s2d,
        space_to_depth,
    )

    rng = np.random.RandomState(2)
    frames = jnp.asarray(rng.randint(0, 255, (2, 64, 96, 3), np.uint8))
    wy, wx, _ = make_letterbox_weights((64, 96), 128)
    mean = jnp.asarray([10.0, 20.0, 30.0])
    std = jnp.asarray([2.0, 3.0, 4.0])

    base = preprocess_frames_xla(frames, wy, wx, mean, std)
    exp = np.asarray(space_to_depth(base, 4))
    assert exp.shape == (2, 32, 32, 48)
    got = np.asarray(
        preprocess_frames_xla_s2d(frames, wy, wx, mean, std))
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_space_to_depth_roundtrip_order():
    """(c, by, bx) channel order contract."""
    from tao_amodal_tpu.ops.pallas.preproc import space_to_depth

    x = np.zeros((1, 8, 8, 3), np.float32)
    x[0, 1, 2, 2] = 7.0  # by=1, bx=2 within block (0,0), channel 2
    out = np.asarray(space_to_depth(jnp.asarray(x), 4))
    # channel index = c*16 + by*4 + bx = 2*16 + 1*4 + 2 = 38
    assert out[0, 0, 0, 38] == 7.0
    assert out.sum() == 7.0


def test_detector_s2d_stems_run():
    """s2d and s2d_pre stems produce the same geometry as classic."""
    import jax

    from tao_amodal_tpu.models.detector import ClipDetector
    from tao_amodal_tpu.ops.pallas.preproc import space_to_depth

    rng = jax.random.PRNGKey(0)
    clip = jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)

    det_s2d = ClipDetector(num_classes=8, num_dets=8, num_proposals=16,
                           backbone_stages=(1, 1, 1, 1), stem="s2d")
    v = det_s2d.init(rng, clip)
    out = det_s2d.apply(v, clip)
    assert out["boxes"].shape == (2, 8, 4)

    det_pre = ClipDetector(num_classes=8, num_dets=8, num_proposals=16,
                           backbone_stages=(1, 1, 1, 1), stem="s2d_pre")
    folded = space_to_depth(clip, 4)
    v2 = det_pre.init(rng, folded)
    out2 = det_pre.apply(v2, folded)
    assert out2["boxes"].shape == (2, 8, 4)
    # Same parameters (the stem conv sees identical inputs) -> same
    # detections as the on-device-fold variant.
    out3 = det_pre.apply(v, folded)
    np.testing.assert_allclose(np.asarray(out3["boxes"]),
                               np.asarray(out["boxes"]), atol=1e-4)


def test_rect_letterbox_matches_square_crop():
    """Rectangular dst (4:3) == the top-left crop of the square path at
    the same scale: same max-side policy, no dead padding."""
    from tao_amodal_tpu.ops.pallas.preproc import (
        make_letterbox_weights,
        preprocess_frames_xla,
    )

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (2, 60, 80, 3), np.uint8)  # 4:3
    mean = jnp.zeros(3)
    std = jnp.ones(3)
    wy_s, wx_s, scale_s = make_letterbox_weights((60, 80), 64)
    sq = np.asarray(preprocess_frames_xla(frames, wy_s, wx_s, mean, std))
    wy_r, wx_r, scale_r = make_letterbox_weights((60, 80), (48, 64))
    rect = np.asarray(preprocess_frames_xla(frames, wy_r, wx_r, mean,
                                            std))
    assert scale_r == scale_s
    assert rect.shape == (2, 48, 64, 3)
    np.testing.assert_allclose(rect, sq[:, :48, :64], atol=1e-5)


def test_rect_s2d_matches_canonical_fold():
    from tao_amodal_tpu.ops.pallas.preproc import (
        make_letterbox_weights,
        preprocess_frames_xla,
        preprocess_frames_xla_s2d,
        space_to_depth,
    )

    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (2, 45, 61, 3), np.uint8)
    mean = jnp.asarray([100.0, 110.0, 120.0])
    std = jnp.asarray([50.0, 55.0, 60.0])
    wy, wx, _ = make_letterbox_weights((45, 61), (48, 64))
    base = preprocess_frames_xla(frames, wy, wx, mean, std)
    want = np.asarray(space_to_depth(base, 4))
    got = np.asarray(preprocess_frames_xla_s2d(frames, wy, wx, mean,
                                               std))
    assert got.shape == (2, 12, 16, 48)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pipeline_runs_on_rect_input():
    """Full detect+expand+track pipeline on a non-square clip (both
    stems)."""
    import jax

    from tao_amodal_tpu.pipeline import AmodalPipeline

    for stem in ("classic", "s2d_pre"):
        pipe = AmodalPipeline.create(
            num_classes=8, num_dets=8, num_proposals=16,
            backbone_stages=(1, 1, 1, 1), stem=stem)
        frames = np.random.RandomState(2).randint(
            0, 255, (2, 96, 128, 3), np.uint8)
        clip, scale = pipe.preprocess(frames, out_size=(96, 128),
                                      use_pallas=False)
        assert scale == 1.0
        variables = pipe.init(jax.random.PRNGKey(0), clip)
        out = pipe(variables, clip)
        assert out["boxes"].shape == (2, 8, 4)
        assert np.isfinite(np.asarray(out["boxes"])).all()
