import numpy as np
import jax.numpy as jnp

from tao_amodal_tpu.ops.xcorr import xcorr_depthwise, xcorr_full


def _naive_depthwise(x, k):
    B, Hx, Wx, C = x.shape
    _, Hz, Wz, _ = k.shape
    Ho, Wo = Hx - Hz + 1, Wx - Wz + 1
    out = np.zeros((B, Ho, Wo, C), np.float32)
    for b in range(B):
        for c in range(C):
            for i in range(Ho):
                for j in range(Wo):
                    out[b, i, j, c] = np.sum(
                        x[b, i:i + Hz, j:j + Wz, c] * k[b, :, :, c])
    return out


def test_depthwise_vs_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    k = rng.randn(2, 3, 3, 4).astype(np.float32)
    got = np.asarray(xcorr_depthwise(jnp.asarray(x), jnp.asarray(k)))
    np.testing.assert_allclose(got, _naive_depthwise(x, k), atol=1e-4)


def test_full_vs_naive():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 7, 7, 3).astype(np.float32)
    k = rng.randn(2, 3, 3, 3).astype(np.float32)
    got = np.asarray(xcorr_full(jnp.asarray(x), jnp.asarray(k)))
    exp = _naive_depthwise(x, k).sum(axis=-1, keepdims=True)
    np.testing.assert_allclose(got, exp, atol=1e-4)
