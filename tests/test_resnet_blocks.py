"""Fused int8 bottleneck-stack kernel: integer-exact parity and
quantization fidelity against the f32 flax trunk."""

import numpy as np
import jax
import jax.numpy as jnp

from tao_amodal_tpu.ops.pallas.resnet_blocks import (
    QuantBlockParams,
    identity_blocks_pallas,
    identity_blocks_reference,
    quantize_bottleneck_params,
)


def _random_params(rs, n, c, m):
    def w(*shape):
        return jnp.asarray(rs.randint(-127, 128, shape), jnp.int8)

    def f(*shape, lo=1e-4, hi=3e-4):
        return jnp.asarray(rs.uniform(lo, hi, shape), jnp.float32)

    return QuantBlockParams(
        w1=w(n, c, m), s1=f(n, m), b1=f(n, m, lo=-.2, hi=.2),
        w2=w(n, 3, 3, m, m), s2=f(n, m), b2=f(n, m, lo=-.2, hi=.2),
        w3=w(n, m, c), s3=f(n, c), b3=f(n, c, lo=-.2, hi=.2),
        res_scale=f(n, lo=0.5, hi=1.5),
    )


def test_pallas_matches_integer_reference():
    rs = np.random.RandomState(0)
    T, H, W, C, M, N = 2, 16, 16, 64, 16, 2
    x = jnp.asarray(rs.randint(0, 128, (T, H, W, C)), jnp.int8)
    p = _random_params(rs, N, C, M)

    ref = np.asarray(identity_blocks_reference(x, p))
    got = np.asarray(identity_blocks_pallas(x, p, interpret=True))
    np.testing.assert_array_equal(got, ref)
    assert got.dtype == np.int8
    assert got.min() >= 0  # post-ReLU domain


def test_quantized_stack_tracks_f32_trunk():
    """Fold+quantize a real flax Bottleneck stack and check the int8
    pipeline approximates the f32 computation (PTQ fidelity)."""
    import flax.linen as nn

    from tao_amodal_tpu.models.backbones import Bottleneck

    C, M, N, T, H = 64, 16, 2, 2, 12
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(1)

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for _ in range(N):
                x = Bottleneck(M, dtype=jnp.float32)(x, train)
            return x

    stack = Stack()
    x_f = jnp.asarray(rs.rand(T, H, H, C) * 2, jnp.float32)
    variables = stack.init(rng, x_f)

    ref = np.asarray(stack.apply(variables, x_f))

    # --- fold flax variables into the quant layout -----------------
    params = variables["params"]
    batch = variables["batch_stats"]

    block_vars = []
    for i in range(N):
        scope = f"Bottleneck_{i}"
        bp = params[scope]
        block_vars.append({
            "conv1/kernel": np.asarray(bp["ConvBN_0"]["Conv_0"]["kernel"]),
            "bn1": _bn(bp, batch[scope], 0),
            "conv2/kernel": np.asarray(bp["ConvBN_1"]["Conv_0"]["kernel"]),
            "bn2": _bn(bp, batch[scope], 1),
            "conv3/kernel": np.asarray(bp["ConvBN_2"]["Conv_0"]["kernel"]),
            "bn3": _bn(bp, batch[scope], 2),
        })

    # --- calibrate activation scales from the f32 run --------------
    # (abs-max of each inter-block tensor; block outputs are shared
    # tensors so 'in' of i+1 == 'out' of i)
    def amax(a):
        return float(np.abs(np.asarray(a)).max()) / 127.0

    acts = [x_f]
    inter = []
    xx = x_f
    for i in range(N):
        sub = {"params": params[f"Bottleneck_{i}"],
               "batch_stats": batch[f"Bottleneck_{i}"]}
        y1 = _apply_convbn(sub, 0, xx)
        y2 = _apply_convbn(sub, 1, y1)
        xx = _apply_block(sub, xx)
        inter.append({"in": amax(acts[-1]), "y1": amax(y1),
                      "y2": amax(y2), "out": amax(xx)})
        acts.append(xx)

    qp = quantize_bottleneck_params(block_vars, inter,
                                    inter[0]["in"], inter[-1]["out"])

    x_q = jnp.clip(jnp.round(x_f / inter[0]["in"]), 0, 127).astype(
        jnp.int8)
    out_q = identity_blocks_reference(x_q, qp)
    out_deq = np.asarray(out_q, np.float32) * inter[-1]["out"]

    # PTQ fidelity: high cosine similarity + small relative error.
    cos = (ref.ravel() @ out_deq.ravel()) / (
        np.linalg.norm(ref) * np.linalg.norm(out_deq) + 1e-9)
    assert cos > 0.995, cos
    rel = np.abs(out_deq - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.1, rel


def _bn(block_params, block_stats, idx):
    scope = f"ConvBN_{idx}"
    p = block_params[scope]["BatchNorm_0"]
    s = block_stats[scope]["BatchNorm_0"]
    return (np.asarray(p["scale"]), np.asarray(p["bias"]),
            np.asarray(s["mean"]), np.asarray(s["var"]))


def _apply_convbn(sub, idx, x):
    """Run ConvBN_idx of a Bottleneck in inference mode (f32)."""
    import flax.linen as nn

    p = sub["params"][f"ConvBN_{idx}"]
    s = sub["batch_stats"][f"ConvBN_{idx}"]
    k = jnp.asarray(p["Conv_0"]["kernel"])
    pad = (k.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bnp, bns = p["BatchNorm_0"], s["BatchNorm_0"]
    inv = jnp.asarray(bnp["scale"]) / jnp.sqrt(
        jnp.asarray(bns["var"]) + 1e-5)
    y = (y - jnp.asarray(bns["mean"])) * inv + jnp.asarray(bnp["bias"])
    return nn.relu(y)


def _apply_block(sub, x):
    """Full identity Bottleneck in inference mode (f32)."""
    y1 = _apply_convbn(sub, 0, x)
    y2 = _apply_convbn(sub, 1, y1)
    # ConvBN_2 has no relu; add residual then relu.
    import flax.linen as nn

    p = sub["params"]["ConvBN_2"]
    s = sub["batch_stats"]["ConvBN_2"]
    k = jnp.asarray(p["Conv_0"]["kernel"])
    y = jax.lax.conv_general_dilated(
        y2, k, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bnp, bns = p["BatchNorm_0"], s["BatchNorm_0"]
    inv = jnp.asarray(bnp["scale"]) / jnp.sqrt(
        jnp.asarray(bns["var"]) + 1e-5)
    y = (y - jnp.asarray(bns["mean"])) * inv + jnp.asarray(bnp["bias"])
    return nn.relu(y + x)


# ---------------------------------------------------------------------
# bf16 fused stacks
# ---------------------------------------------------------------------

def _random_bf16_params(rs, n, c, m):
    from tao_amodal_tpu.ops.pallas.resnet_blocks import Bf16BlockParams

    def w(*shape):
        return jnp.asarray(rs.randn(*shape) * 0.05, jnp.bfloat16)

    def f(*shape):
        return jnp.asarray(rs.uniform(0.5, 1.5, shape), jnp.float32)

    return Bf16BlockParams(
        w1=w(n, c, m), g1=f(n, m), b1=f(n, m) - 1.0,
        w2=w(n, 3, 3, m, m), g2=f(n, m), b2=f(n, m) - 1.0,
        w3=w(n, m, c), g3=f(n, c), b3=f(n, c) - 1.0)


def test_bf16_pallas_matches_reference():
    from tao_amodal_tpu.ops.pallas.resnet_blocks import (
        identity_blocks_bf16_pallas,
        identity_blocks_bf16_reference,
    )

    rs = np.random.RandomState(2)
    T, H, W, C, M, N = 2, 12, 12, 64, 16, 3
    x = jnp.asarray(rs.rand(T, H, W, C), jnp.bfloat16)
    p = _random_bf16_params(rs, N, C, M)
    ref = np.asarray(identity_blocks_bf16_reference(x, p),
                     np.float32)
    got = np.asarray(identity_blocks_bf16_pallas(x, p, interpret=True),
                     np.float32)
    np.testing.assert_array_equal(got, ref)


def test_bf16_stack_tracks_flax_bottlenecks():
    """BN-folded bf16 stack ~= the flax bf16 Bottleneck stack (the
    fused path accumulates in f32, so only bf16-level tolerance)."""
    import flax.linen as nn

    from tao_amodal_tpu.models.backbones import Bottleneck
    from tao_amodal_tpu.ops.pallas.resnet_blocks import (
        bf16_params_from_bottlenecks,
        identity_blocks_bf16_reference,
    )

    C, M, N, T, H = 64, 16, 2, 2, 12
    rng = jax.random.PRNGKey(3)
    rs = np.random.RandomState(4)

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for _ in range(N):
                x = Bottleneck(M, dtype=jnp.bfloat16)(x, train)
            return x

    stack = Stack()
    x = jnp.asarray(rs.rand(T, H, H, C), jnp.bfloat16)
    variables = stack.init(rng, x)
    ref = np.asarray(stack.apply(variables, x), np.float32)

    params = variables["params"]
    batch = variables["batch_stats"]
    block_vars = []
    for i in range(N):
        scope = f"Bottleneck_{i}"
        bp = params[scope]
        block_vars.append({
            "conv1/kernel": np.asarray(bp["ConvBN_0"]["Conv_0"]["kernel"]),
            "bn1": _bn(bp, batch[scope], 0),
            "conv2/kernel": np.asarray(bp["ConvBN_1"]["Conv_0"]["kernel"]),
            "bn2": _bn(bp, batch[scope], 1),
            "conv3/kernel": np.asarray(bp["ConvBN_2"]["Conv_0"]["kernel"]),
            "bn3": _bn(bp, batch[scope], 2),
        })
    p = bf16_params_from_bottlenecks(block_vars)
    got = np.asarray(identity_blocks_bf16_reference(x, p), np.float32)
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
