"""Online-solver + DCF + DiMP component tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tao_amodal_tpu.ops.optimization import (
    conjugate_gradient,
    gauss_newton_cg,
    gradient_descent_l2,
    tree_dot,
)
from tao_amodal_tpu.ops import fourier


def test_cg_solves_spd_system():
    rng = np.random.RandomState(0)
    M = rng.randn(8, 8)
    A_mat = M @ M.T + 0.5 * np.eye(8)
    b = rng.randn(8)

    x = conjugate_gradient(
        lambda v: jnp.asarray(A_mat, jnp.float32) @ v,
        jnp.asarray(b, jnp.float32), num_iters=30)
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(A_mat, b), atol=1e-3)


def test_cg_over_pytree():
    # Block-diagonal SPD over a dict pytree.
    def A(tree):
        return {"a": 3.0 * tree["a"], "b": 2.0 * tree["b"]}

    b = {"a": jnp.ones(4), "b": jnp.full((2, 2), 2.0)}
    x = conjugate_gradient(A, b, num_iters=5)
    np.testing.assert_allclose(np.asarray(x["a"]), 1 / 3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x["b"]), 1.0, atol=1e-5)


def test_gauss_newton_converges_on_linear_least_squares():
    rng = np.random.RandomState(1)
    J = jnp.asarray(rng.randn(12, 5), jnp.float32)
    target = jnp.asarray(rng.randn(12), jnp.float32)

    def residual(x):
        return J @ x - target

    x0 = jnp.zeros(5)
    x, losses = gauss_newton_cg(residual, x0, num_gn_iters=3,
                                num_cg_iters=10)
    exp = np.linalg.lstsq(np.asarray(J), np.asarray(target),
                          rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), exp, atol=1e-3)
    assert losses[-1] < losses[0]


def test_gradient_descent_l2():
    def loss(x):
        return jnp.sum((x - 3.0) ** 2)

    x = gradient_descent_l2(loss, jnp.zeros(3), num_iters=200,
                            step_length=0.1)
    np.testing.assert_allclose(np.asarray(x), 3.0, atol=1e-3)


def test_dcf_peak_localization():
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(32, 32, 4), jnp.float32)
    resp_target = fourier.gaussian_response((32, 32), sigma=2.0)
    filt = fourier.train_dcf(feats, resp_target)
    resp = fourier.apply_dcf(feats, filt)
    # Training-frame response must peak at the origin.
    peak = np.unravel_index(np.argmax(np.asarray(resp)), (32, 32))
    assert peak == (0, 0)
    # Shifted features produce a shifted peak (circular).
    shifted = jnp.roll(feats, shift=(5, 3), axis=(0, 1))
    resp2 = fourier.apply_dcf(shifted, filt)
    peak2 = np.unravel_index(np.argmax(np.asarray(resp2)), (32, 32))
    assert peak2 == (5, 3)


def test_train_filter_fits_response():
    from tao_amodal_tpu.models.dimp import classify, train_filter

    rng = np.random.RandomState(3)
    # Enough filter capacity (4*4*16 = 256 params) to fit the two
    # 81-pixel responses; the residual is linear in the filter so GN
    # converges in one outer step.
    feats = jnp.asarray(rng.randn(2, 12, 12, 16), jnp.float32)
    fs = 4
    out_hw = 12 - fs + 1
    from tao_amodal_tpu.trackers.dimp import gaussian_label

    labels = jnp.stack([
        gaussian_label((out_hw, out_hw), jnp.array([4.0, 4.0])),
        gaussian_label((out_hw, out_hw), jnp.array([2.0, 6.0])),
    ])
    filt, losses = train_filter(feats, labels, (fs, fs, 16),
                                num_gn_iters=3, num_cg_iters=40,
                                reg=1e-3)
    assert float(losses[-1]) < float(losses[0]) * 0.5
    resp = classify(feats, filt)
    peak0 = np.unravel_index(np.argmax(np.asarray(resp[0])),
                             (out_hw, out_hw))
    assert abs(peak0[0] - 4) <= 1 and abs(peak0[1] - 4) <= 1


def test_dimp_actor_meta_gradients():
    """Meta-gradients flow through the inner filter optimization."""
    import flax.linen as nn

    from tao_amodal_tpu.models.dimp import IoUNet
    from tao_amodal_tpu.train.dimp_loss import dimp_actor_loss

    class TinyExtractor(nn.Module):
        @nn.compact
        def __call__(self, imgs):
            x = nn.Conv(16, (3, 3), strides=4, padding="SAME")(imgs)
            return nn.relu(x)

    rng = np.random.RandomState(0)
    S = 32
    extractor = TinyExtractor()
    ex_vars = extractor.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, S, S, 3)))
    iou_net = IoUNet(features=16, pool_size=3)
    h = S // 4
    iou_vars = iou_net.init(jax.random.PRNGKey(1),
                            jnp.zeros((h, h, 16)),
                            jnp.zeros((3 * 3 * 16,)),
                            jnp.zeros((1, 4)), spatial_scale=1.0)

    batch = {
        "train_images": jnp.asarray(
            rng.rand(2, 2, S, S, 3).astype(np.float32)),
        "train_boxes": jnp.tile(
            jnp.array([8.0, 8.0, 24.0, 24.0]), (2, 2, 1)),
        "test_images": jnp.asarray(
            rng.rand(2, 2, S, S, 3).astype(np.float32)),
        "test_boxes": jnp.tile(
            jnp.array([10.0, 8.0, 26.0, 24.0]), (2, 2, 1)),
    }
    variables = {"extractor": ex_vars, "iou": iou_vars}

    def loss_fn(v):
        total, _ = dimp_actor_loss(
            lambda vv, im: extractor.apply(vv, im), iou_net, v, batch,
            filter_size=3, num_gn_iters=2, num_cg_iters=3)
        return total

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # The extractor must receive nonzero meta-gradient through the
    # inner Gauss-Newton optimization.
    gex = jax.tree_util.tree_leaves(grads["extractor"])
    assert sum(float(np.abs(np.asarray(g)).sum()) for g in gex) > 0
