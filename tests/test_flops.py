"""Analytic FLOP counter (utils/flops.py) — the MFU numerator in
bench.py must be trustworthy, so pin it against closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tao_amodal_tpu.utils.flops import (
    count_flops,
    resnet50_reference_flops,
)

pytestmark = pytest.mark.fast


def test_dot_general_closed_form():
    def f(a, b):
        return a @ b

    a = jax.ShapeDtypeStruct((64, 128), jnp.float32)
    b = jax.ShapeDtypeStruct((128, 32), jnp.float32)
    assert count_flops(f, a, b) == 2 * 64 * 128 * 32


def test_batched_matmul_and_einsum():
    def f(a, b):
        return jnp.einsum("bik,bkj->bij", a, b)

    a = jax.ShapeDtypeStruct((4, 8, 16), jnp.float32)
    b = jax.ShapeDtypeStruct((4, 16, 5), jnp.float32)
    assert count_flops(f, a, b) == 2 * 4 * 8 * 16 * 5


def test_conv_closed_form():
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jax.ShapeDtypeStruct((2, 32, 32, 8), jnp.float32)
    w = jax.ShapeDtypeStruct((3, 3, 8, 16), jnp.float32)
    # 2 * out_positions(=2*32*32*16) * kh*kw(9) * Cin(8)
    assert count_flops(f, x, w) == 2 * (2 * 32 * 32 * 16) * 9 * 8


def test_grouped_conv_counts_per_group_channels():
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=4,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jax.ShapeDtypeStruct((1, 8, 8, 16), jnp.float32)
    w = jax.ShapeDtypeStruct((3, 3, 4, 16), jnp.float32)  # 16/4 per grp
    assert count_flops(f, x, w) == 2 * (1 * 8 * 8 * 16) * 9 * 4


def test_scan_multiplies_by_trip_count():
    def f(x, w):
        def body(c, _):
            return c @ w, ()

        out, _ = jax.lax.scan(body, x, None, length=7)
        return out

    x = jax.ShapeDtypeStruct((16, 16), jnp.float32)
    w = jax.ShapeDtypeStruct((16, 16), jnp.float32)
    assert count_flops(f, x, w) == 7 * 2 * 16 * 16 * 16


def test_recurses_through_jit_and_remat():
    w = jnp.ones((32, 32))

    @jax.jit
    def inner(x):
        return jax.checkpoint(lambda y: y @ w)(x)

    def f(x):
        return inner(x)

    x = jax.ShapeDtypeStruct((8, 32), jnp.float32)
    assert count_flops(f, x) == 2 * 8 * 32 * 32


def test_r50_trunk_matches_literature_anchor():
    """The flax ResNet-50 trunk at 224x224 must land near the
    literature's 4.09 GMACs = 8.18 GFLOPs (2 flops/MAC convention)."""
    from tao_amodal_tpu.models.backbones import ResNet

    model = ResNet(stage_sizes=(3, 4, 6, 3))
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    def fwd(img):
        return model.apply(variables, img)

    counted = count_flops(fwd, jax.ShapeDtypeStruct(x.shape, x.dtype))
    anchor = resnet50_reference_flops(224, 224)
    # Trunk-only vs trunk+fc differences and stem variants allow a
    # one-sided ~5% band.
    assert counted == pytest.approx(anchor, rel=0.05), (
        counted, anchor)


def test_mfu_numerator_scales_with_resolution():
    """Doubling spatial area ~doubles conv FLOPs (stem padding keeps
    it from exact 2x)."""
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    w = jax.ShapeDtypeStruct((3, 3, 8, 8), jnp.float32)
    f1 = count_flops(conv, jax.ShapeDtypeStruct((1, 32, 32, 8),
                                                jnp.float32), w)
    f2 = count_flops(conv, jax.ShapeDtypeStruct((1, 32, 64, 8),
                                                jnp.float32), w)
    assert f2 == 2 * f1
