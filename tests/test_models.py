"""Model forward-pass shape/grad smoke tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tao_amodal_tpu.models.amodal_expander import AmodalExpander
from tao_amodal_tpu.models.backbones import AlexNet, MobileNetV2, ResNet


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_resnet_stages_and_strides(rng):
    model = ResNet(stage_sizes=(1, 1, 1, 1), out_stages=(1, 2, 3, 4))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(rng, x)
    outs = model.apply(vars_, x)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


def test_resnet_atrous_keeps_stride8(rng):
    model = ResNet(stage_sizes=(1, 1, 1, 1), out_stages=(4,),
                   strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(rng, x)
    out = model.apply(vars_, x)
    assert out.shape[1] == 8  # stride 8, not 32


def test_alexnet_mobilenet(rng):
    x = jnp.zeros((1, 127, 127, 3))
    out = AlexNet().apply(AlexNet().init(rng, x), x)
    assert out.ndim == 4 and out.shape[-1] == 256
    m = MobileNetV2(out_stages=(7,))
    out = m.apply(m.init(rng, jnp.zeros((1, 64, 64, 3))),
                  jnp.zeros((1, 64, 64, 3)))
    assert out.shape[-1] == 320


def test_amodal_expander_zero_init_is_identity(rng):
    model = AmodalExpander()
    feats = jnp.ones((7, 32))
    boxes = jnp.asarray(np.random.RandomState(0).rand(7, 4) * 50
                        + np.array([0, 0, 60, 60]))
    vars_ = model.init(rng, feats, boxes, image_hw=(128, 128))
    amodal, deltas = model.apply(vars_, feats, boxes,
                                 image_hw=(128, 128))
    # Zero-init delta head -> amodal == visible at init.
    np.testing.assert_allclose(np.asarray(amodal), np.asarray(boxes),
                               atol=1e-4)
    # Gradients flow to both inputs.
    g = jax.grad(lambda v: jnp.sum(model.apply(
        v, feats, boxes, image_hw=(128, 128))[0]))(vars_)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_siamese_track_shapes(rng):
    from tao_amodal_tpu.models.siamese import SiameseTracker

    model = SiameseTracker(num_levels=3)
    # Shrink backbone for test speed.
    z = jnp.zeros((1, 127, 127, 3))
    x = jnp.zeros((1, 255, 255, 3))
    vars_ = model.init(rng, template=z, search=x, mode="train")
    out = model.apply(vars_, template=z, search=x, mode="train")
    ss = out["cls"].shape
    assert ss[0] == 1 and ss[-1] == 2 * 5
    assert out["loc"].shape[-1] == 4 * 5
    assert out["cls"].shape[1] == out["loc"].shape[1]


def test_rpn_packed_matches_per_level():
    """Packed-canvas RPN tower == per-level application, exactly."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tao_amodal_tpu.models.rpn import RPNHead

    rs = np.random.RandomState(0)
    feats = [jnp.asarray(rs.randn(2, s, s, 32), jnp.float32)
             for s in (16, 8, 4)]
    rpn = RPNHead(num_anchors=3, features=32)
    v = rpn.init(jax.random.PRNGKey(0), feats, packed=False)

    objs_u, deltas_u = rpn.apply(v, feats, packed=False)
    objs_p, deltas_p = rpn.apply(v, feats, packed=True)
    for u, p in zip(objs_u + deltas_u, objs_p + deltas_p):
        np.testing.assert_allclose(np.asarray(p), np.asarray(u),
                                   rtol=1e-5, atol=1e-5)
