"""Fused bottleneck-chain kernel: parity with the XLA conv chain.

The kernel (ops/pallas/fused_stage.py) replaces the HBM-round-tripping
per-conv XLA lowering of the trunk's early stages on the serving path;
these tests pin (a) kernel == conv-chain math including the SAME-pad
frame edges, (b) the custom VJP == autodiff of the conv chain, (c) the
ResNet integration (folded BN, block naming, strided-stage split), and
(d) train/init paths still run unfused.

Reference semantics being replaced: torch Bottleneck stacks,
``pysot/pysot/models/backbone/resnet_atrous.py`` (Bottleneck.forward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tao_amodal_tpu.ops.pallas.fused_stage as F
from tao_amodal_tpu.models.backbones import ResNet


def _mkblock(rs, cin, m, ds):
    p = dict(
        wa=rs.randn(1, 1, cin, m).astype(np.float32) * 0.2,
        ba=rs.randn(m).astype(np.float32) * 0.1,
        w3=rs.randn(3, 3, m, m).astype(np.float32) * 0.1,
        b3=rs.randn(m).astype(np.float32) * 0.1,
        wb=rs.randn(1, 1, m, 4 * m).astype(np.float32) * 0.1,
        bb=rs.randn(4 * m).astype(np.float32) * 0.1,
    )
    if ds:
        p["wd"] = rs.randn(1, 1, cin, 4 * m).astype(np.float32) * 0.2
        p["bd"] = rs.randn(4 * m).astype(np.float32) * 0.1
    return p


def _run_fused(x, params, tile_rows):
    layout = [(("wd" in p), 8 + 2 * ("wd" in p)) for p in params]
    flat = []
    for p in params:
        flat += F._block_param_arrays(p, x.dtype)
    return F._fused_chain_forward(x, flat, layout, tile_rows,
                                  interpret=True)


@pytest.mark.parametrize("nblocks", [1, 2, 3])
def test_chain_matches_reference(nblocks):
    """Kernel == conv chain for 1-3 blocks incl. the projection
    shortcut and the frame-edge zero-pad semantics (biases make
    conv(0) != 0, which the kernel must re-zero between blocks)."""
    rs = np.random.RandomState(nblocks)
    T, H, W, Cin, M = 2, 48, 32, 64, 16
    params = [_mkblock(rs, Cin, M, True)] + [
        _mkblock(rs, 4 * M, M, False) for _ in range(nblocks - 1)]
    x = jnp.asarray(rs.randn(T, H, W, Cin).astype(np.float32))
    ref = F.bottleneck_chain_reference(x, params)
    out = _run_fused(x, params, tile_rows=12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_single_tile_and_uneven_tiles():
    """tile_rows falls back to a divisor of H; whole-frame tile also
    exact."""
    rs = np.random.RandomState(7)
    T, H, W, Cin, M = 1, 40, 32, 32, 8
    params = [_mkblock(rs, Cin, M, True), _mkblock(rs, 4 * M, M, False)]
    x = jnp.asarray(rs.randn(T, H, W, Cin).astype(np.float32))
    ref = F.bottleneck_chain_reference(x, params)
    for tr in (40, 20, 10, 5):
        out = _run_fused(x, params, tile_rows=tr)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_custom_vjp_matches_reference_grads(monkeypatch):
    """Gradients through fused_bottleneck_chain == autodiff of the conv
    chain, in x AND in every folded weight (the training contract)."""
    orig = F._fused_chain_forward
    monkeypatch.setattr(
        F, "_fused_chain_forward",
        lambda x, fp, lo, S, interpret=False: orig(x, fp, lo, S,
                                                   interpret=True))
    rs = np.random.RandomState(3)
    T, H, W, Cin, M = 1, 24, 16, 32, 8
    params = [_mkblock(rs, Cin, M, True), _mkblock(rs, 4 * M, M, False)]
    x = jnp.asarray(rs.randn(T, H, W, Cin).astype(np.float32))

    g1 = jax.grad(lambda xx, pp: (F.fused_bottleneck_chain(
        xx, pp, tile_rows=12) ** 2).sum(), argnums=(0, 1))(x, params)
    g2 = jax.grad(lambda xx, pp: (F.bottleneck_chain_reference(
        xx, pp) ** 2).sum(), argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1[1]),
                    jax.tree_util.tree_leaves(g2[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fold_convbn_matches_convbn_module():
    """fold_convbn reproduces ConvBN's inference BN affine exactly."""
    import flax.linen as nn

    from tao_amodal_tpu.models.backbones import ConvBN

    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(2, 8, 8, 16).astype(np.float32))
    mod = ConvBN(24, (3, 3), use_relu=False)
    v = mod.init(jax.random.PRNGKey(0), x)
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rs.rand(*a.shape), a.dtype) * 0.5 + 0.5,
        v["batch_stats"])
    v = {"params": v["params"], "batch_stats": bs}
    ref = mod.apply(v, x)
    w, b = F.fold_convbn(
        v["params"]["Conv_0"]["kernel"],
        v["params"]["BatchNorm_0"]["scale"],
        v["params"]["BatchNorm_0"]["bias"],
        v["batch_stats"]["BatchNorm_0"]["mean"],
        v["batch_stats"]["BatchNorm_0"]["var"])
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _rand_stats(v, rs):
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rs.rand(*a.shape), a.dtype) * 0.5 + 0.5,
        v["batch_stats"])
    return {"params": v["params"], "batch_stats": bs}


def test_resnet_fused_stage_matches_unfused():
    """ResNet(fused_stages=(1, 2)) == plain ResNet at apply time: the
    strided first block of stage 2 runs unfused ahead of the fused
    tail, stage 1 fuses whole (incl. its projection block)."""
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.rand(2, 48, 64, 48).astype(np.float32))
    kw = dict(stage_sizes=(3, 3, 2, 2), out_stages=(2, 3, 4),
              stem="s2d_pre")
    v = _rand_stats(ResNet(**kw).init(jax.random.PRNGKey(0), x), rs)
    ref = ResNet(**kw).apply(v, x)
    out = ResNet(fused_stages=(1, 2), **kw).apply(v, x)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(b).astype(np.float32),
            np.asarray(a).astype(np.float32), rtol=2e-4, atol=2e-4)


def test_resnet_fused_train_path_unfused():
    """train=True never enters the kernel (BN uses batch stats; the
    fused path folds running stats)."""
    import tao_amodal_tpu.ops.pallas.fused_stage as FS

    calls = []
    orig = FS.fused_bottleneck_chain

    def spy(x, params, tile_rows=24):
        calls.append(x.shape)
        return orig(x, params, tile_rows)

    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.rand(1, 32, 32, 48).astype(np.float32))
    kw = dict(stage_sizes=(2, 2, 2, 2), out_stages=(2, 3, 4),
              stem="s2d_pre", fused_stages=(1,))
    net = ResNet(**kw)
    v = net.init(jax.random.PRNGKey(0), x)
    # backbones does a call-time `from fused_stage import ...`, so
    # patching the module attribute intercepts it.
    FS.fused_bottleneck_chain = spy
    try:
        net.apply(v, x, train=True, mutable=["batch_stats"])
        assert calls == []  # train path: unfused
        net.apply(v, x)
        assert len(calls) == 1  # inference path: fused
    finally:
        FS.fused_bottleneck_chain = orig
