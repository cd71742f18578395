import numpy as np
import jax
import jax.numpy as jnp

from tao_amodal_tpu.train.paste_n_occlude import (
    make_occluder_bank,
    paste_n_occlude,
    paste_patch,
    shrink_visible_box,
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
