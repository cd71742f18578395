import numpy as np
import jax
import jax.numpy as jnp

from tao_amodal_tpu.train.paste_n_occlude import (
    make_occluder_bank,
    paste_n_occlude,
    paste_n_occlude_batch,
    paste_patch,
    shrink_visible_box,
    synthetic_occluder_bank,
)


def test_paste_patch_blends_and_masks():
    img = jnp.zeros((32, 32, 3))
    patch = jnp.concatenate([
        jnp.full((8, 8, 3), 1.0), jnp.ones((8, 8, 1))], axis=-1)
    out, mask = paste_patch(img, patch, jnp.array([16.0, 16.0]), 1.0)
    assert bool(mask[16, 16])
    assert not bool(mask[2, 2])
    assert float(out[16, 16, 0]) > 0.9
    assert float(out[2, 2, 0]) == 0.0


def test_shrink_visible_box():
    occ = np.zeros((40, 40), bool)
    occ[10:40, 10:18] = True  # occlude the left strip of the box
    box = jnp.array([10.0, 10.0, 30.0, 30.0])
    new_box, vis = shrink_visible_box(box, jnp.asarray(occ))
    nb = np.asarray(new_box)
    assert nb[0] >= 18.0  # visible region starts right of occluder
    assert 0.5 < float(vis) < 0.7  # 8/20 columns occluded


def test_paste_n_occlude_end_to_end():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    bank_imgs = [(rng.rand(20, 20, 3).astype(np.float32),
                  np.ones((20, 20), np.uint8)) for _ in range(3)]
    bank = make_occluder_bank(bank_imgs, patch_size=16)
    out = paste_n_occlude(img, jnp.array([16.0, 16.0, 48.0, 48.0]),
                          bank, jax.random.PRNGKey(0))
    assert out["image"].shape == (64, 64, 3)
    assert 0.0 <= float(out["visibility"]) <= 1.0
    np.testing.assert_allclose(np.asarray(out["amodal_box"]),
                               [16, 16, 48, 48])
    # Modal box stays inside the amodal box.
    mb = np.asarray(out["modal_box"])
    assert mb[0] >= 15.9 and mb[1] >= 15.9
    assert mb[2] <= 48.1 and mb[3] <= 48.1
    # vmap over a batch works (the training-pipeline usage).
    imgs = jnp.stack([img] * 4)
    boxes = jnp.tile(jnp.array([16.0, 16.0, 48.0, 48.0]), (4, 1))
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    batched = jax.vmap(lambda i, b, k: paste_n_occlude(i, b, bank, k))(
        imgs, boxes, keys)
    assert batched["image"].shape == (4, 64, 64, 3)


def test_synthetic_occluder_bank_shapes_and_alpha():
    bank = synthetic_occluder_bank(seed=3, num=5, patch_size=32)
    assert bank.shape == (5, 32, 32, 4)
    a = np.asarray(bank[..., 3])
    # Elliptical alpha: opaque center, transparent corners.
    assert (a[:, 16, 16] == 1.0).all()
    assert (a[:, 0, 0] == 0.0).all()
    rgb = np.asarray(bank[..., :3])
    assert rgb.min() >= 0.0 and rgb.max() <= 255.0


def test_paste_n_occlude_batch_training_contract():
    """The detector-batch wrapper: amodal targets untouched, visible
    boxes shrink-or-stay, zero-visibility gts invalidated, no-gt
    samples pass through unchanged."""
    rng = np.random.RandomState(1)
    B, G, H, W = 3, 4, 64, 64
    images = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    gt_amodal = jnp.asarray(
        [[[4, 4, 60, 60], [-8, 10, 20, 40], [30, 30, 50, 50],
          [0, 0, 0, 0]]] * B, jnp.float32)
    # Visible = frame-clipped amodal (the synth_video contract).
    gt_boxes = jnp.clip(gt_amodal,
                        jnp.zeros(4), jnp.asarray([W, H, W, H],
                                                  jnp.float32))
    gt_valid = jnp.asarray([[True, True, True, False],
                            [True, True, True, False],
                            [False, False, False, False]])
    bank = synthetic_occluder_bank(seed=0, num=4, patch_size=16)
    img2, boxes2, valid2, vis = paste_n_occlude_batch(
        images, gt_boxes, gt_amodal, gt_valid, bank,
        jax.random.PRNGKey(0), occlude_prob=1.0)
    assert img2.shape == images.shape
    assert boxes2.shape == gt_boxes.shape
    assert vis.shape == (B, G)
    b0, b2 = np.asarray(boxes2), np.asarray(gt_boxes)
    # Visible boxes never grow.
    valid_np = np.asarray(gt_valid)
    assert (b0[..., 0][valid_np] >= b2[..., 0][valid_np] - 1e-3).all()
    assert (b0[..., 1][valid_np] >= b2[..., 1][valid_np] - 1e-3).all()
    assert (b0[..., 2][valid_np] <= b2[..., 2][valid_np] + 1e-3).all()
    assert (b0[..., 3][valid_np] <= b2[..., 3][valid_np] + 1e-3).all()
    # Something was actually occluded (occlude_prob=1).
    assert float(np.asarray(vis)[:2][np.asarray(gt_valid[:2])].min()) \
        < 1.0
    # Invalid slots stay invalid; zero-visibility slots become invalid.
    v2 = np.asarray(valid2)
    assert not v2[0, 3] and not v2[2].any()
    assert (v2 <= valid_np).all()
    zero_vis = np.asarray(vis) <= 0.0
    assert not (v2 & zero_vis).any()
    # The no-valid-gt sample's pixels are untouched.
    np.testing.assert_allclose(np.asarray(img2[2]),
                               np.asarray(images[2]))
