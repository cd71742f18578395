"""Backbones: ResNet (atrous-capable), AlexNet, MobileNetV2.

Feature extractors for both the Siamese trackers and the detector —
capability-parity with the reference backbone zoo
(``pysot/models/backbone/{resnet_atrous,alexnet,mobile_v2}.py``), built
fresh in flax.linen with TPU conventions:

  * NHWC layout, channels last (XLA's preferred TPU layout);
  * ``dtype`` threading for bfloat16 compute with fp32 params;
  * dilation (atrous) options on stages 3/4 so stride-8 feature maps
    feed the trackers, stride-32 pyramid feeds FPN;
  * multi-stage outputs selected by ``out_stages``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    use_relu: bool = True
    # int8 inference mode: per-channel weight scales, int32
    # accumulation. NOTE (measured, v5e via XLA conv): currently ~13%
    # SLOWER than bf16 — XLA does not route this lowering onto the 2x
    # int8 MXU path and the (re)quantization passes cost bandwidth.
    # Kept as a capability flag; revisit with native quant support.
    # act_scale: optional static calibrated activation scale.
    int8: bool = False
    act_scale: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        pad = ((self.kernel[0] - 1) // 2 * self.dilation,) * 2
        if self.int8 and not train:
            x = _int8_conv(self, x, pad)
        else:
            x = nn.Conv(self.features, self.kernel,
                        strides=self.strides,
                        kernel_dilation=self.dilation,
                        padding=[pad, pad], use_bias=False,
                        dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


def _int8_conv(mod: "ConvBN", x, pad):
    """Quantized conv body (shares the f32 kernel parameters so the
    same checkpoint serves both modes)."""
    kh, kw = mod.kernel
    in_ch = x.shape[-1]
    w = mod.param("qkernel", nn.initializers.lecun_normal(),
                  (kh, kw, in_ch, mod.features), jnp.float32)
    # Per-output-channel weight scales.
    w_max = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True)
    s_w = jnp.maximum(w_max, 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    # Activation scale: a calibrated static constant when provided
    # (zero extra passes), else dynamic per-tensor abs-max.
    x_f = x.astype(jnp.float32)
    if mod.act_scale is not None:
        s_x = jnp.float32(mod.act_scale)
    else:
        s_x = jnp.maximum(jnp.max(jnp.abs(x_f)), 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(x_f / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x8, w8, window_strides=(mod.strides, mod.strides),
        padding=[pad, pad], rhs_dilation=(mod.dilation, mod.dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32)
            * (s_x * s_w.reshape(1, 1, 1, -1))).astype(mod.dtype)


class Bottleneck(nn.Module):
    """ResNet bottleneck with optional dilation (atrous).

    NOTE: the fused-stage folding path (``_folded_block_params``)
    addresses this module's children by their Flax auto-names
    (``ConvBN_0..3`` / ``Conv_0`` / ``BatchNorm_0``) in construction
    order; reordering or renaming submodules here breaks the folding
    (loud KeyError on the fused inference path).  The fused-vs-unfused
    parity test in tests/test_fused_stage.py is the guard.
    """

    features: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out = ConvBN(self.features, (1, 1), dtype=self.dtype,
                     int8=self.int8)(x, train)
        out = ConvBN(self.features, (3, 3), strides=self.strides,
                     dilation=self.dilation, dtype=self.dtype,
                     int8=self.int8)(out, train)
        out = ConvBN(self.features * 4, (1, 1), dtype=self.dtype,
                     use_relu=False, int8=self.int8)(out, train)
        if self.downsample:
            residual = ConvBN(self.features * 4, (1, 1),
                              strides=self.strides, dtype=self.dtype,
                              use_relu=False, int8=self.int8)(x, train)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """ResNet-{18..152}-style bottleneck backbone.

    ``out_stages`` selects which stage outputs (1-indexed: conv2..conv5)
    are returned, matching the reference's ``used_layers`` semantics.
    ``dilations`` applies atrous convs in stages 3/4 (the reference's
    stride-8 trunk for Siamese tracking).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    out_stages: Sequence[int] = (2, 3, 4)
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    dtype: Any = jnp.float32
    int8: bool = False
    # Stem variants (all land at stride 4 / 64ch):
    #   'classic' — 7x7 s2 conv + 3x3 maxpool (the torch layout);
    #   's2d'     — 4x4 space-to-depth fold + 3x3 conv.  TPU-first: the
    #               classic stem is layout-hostile (3-ch input wastes
    #               125/128 MXU lanes; the 256^2x64 intermediate is
    #               pure HBM traffic) — measured 2.8 -> 1.3 ms/16-frame
    #               512^2 clip on v5e;
    #   's2d_pre' — input is ALREADY in s2d layout [H/4, W/4, 48]
    #               (produced by the fused Pallas preprocessing kernel,
    #               ops/pallas/preproc.preprocess_clip_s2d) — measured
    #               0.5 ms: the fold rides the preproc pass for free.
    stem: str = "classic"
    # Stages (1-indexed, conv2..conv5) whose stride-1 bottleneck chain
    # runs through the fused Pallas kernel on the inference path
    # (ops/pallas/fused_stage): one HBM read + one write per stage
    # instead of per-conv round-trips.  The strided first block of
    # stages 2-4 stays XLA; stage 1 fuses whole.  Training and init
    # always take the unfused path (the kernel's custom VJP
    # differentiates the exact XLA chain anyway); parity is tested in
    # tests/test_fused_stage.py.
    fused_stages: Sequence[int] = ()

    def _folded_block_params(self, name, has_ds):
        """Inference-folded (conv+BN -> matmul+bias) params of one
        Bottleneck child, for the fused-stage kernel."""
        from tao_amodal_tpu.ops.pallas.fused_stage import fold_convbn

        pv = self.variables["params"][name]
        bs = self.variables["batch_stats"][name]

        def fold(cb):
            bn_p, bn_s = pv[cb]["BatchNorm_0"], bs[cb]["BatchNorm_0"]
            return fold_convbn(pv[cb]["Conv_0"]["kernel"],
                               bn_p["scale"], bn_p["bias"],
                               bn_s["mean"], bn_s["var"])

        wa, ba = fold("ConvBN_0")
        w3, b3 = fold("ConvBN_1")
        wb, bb = fold("ConvBN_2")
        p = dict(wa=wa, ba=ba, w3=w3, b3=b3, wb=wb, bb=bb)
        if has_ds:
            p["wd"], p["bd"] = fold("ConvBN_3")
        return p

    @nn.compact
    def __call__(self, x, train=False):
        if self.stem == "classic":
            x = ConvBN(64, (7, 7), strides=2, dtype=self.dtype,
                       int8=self.int8)(x, train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        elif self.stem in ("s2d", "s2d_pre"):
            if self.stem == "s2d":
                from tao_amodal_tpu.ops.pallas.preproc import (
                    space_to_depth,
                )
                x = space_to_depth(x, 4)
            x = ConvBN(64, (3, 3), dtype=self.dtype,
                       int8=self.int8)(x, train)
        else:
            raise ValueError(f"unknown stem: {self.stem}")
        outputs = []
        features = 64
        block_idx = 0
        for stage, blocks in enumerate(self.stage_sizes):
            fuse = ((stage + 1) in self.fused_stages
                    and not train and not self.is_initializing()
                    and not self.int8
                    and self.dilations[stage] == 1)
            mods = []
            for i in range(blocks):
                stride = self.strides[stage] if i == 0 else 1
                mods.append(Bottleneck(
                    features, strides=stride,
                    dilation=self.dilations[stage],
                    downsample=(i == 0), dtype=self.dtype,
                    int8=self.int8))
            # The fused kernel handles stride-1 chains; a strided
            # first block runs unfused ahead of it.
            start = 0 if self.strides[stage] == 1 else 1
            if fuse and blocks - start >= 2:
                from tao_amodal_tpu.ops.pallas.fused_stage import (
                    fused_bottleneck_chain,
                )

                for i in range(start):
                    x = mods[i](x, train)
                params = [
                    self._folded_block_params(
                        f"Bottleneck_{block_idx + i}",
                        has_ds=(i == 0 and start == 0))
                    for i in range(start, blocks)]
                x = fused_bottleneck_chain(x.astype(self.dtype),
                                           params)
            else:
                for m in mods:
                    x = m(x, train)
            block_idx += blocks
            if (stage + 1) in self.out_stages:
                outputs.append(x)
            features *= 2
        return outputs if len(outputs) > 1 else outputs[0]


def resnet50(out_stages=(2, 3, 4), atrous=False, dtype=jnp.float32):
    """ResNet-50; ``atrous=True`` gives the tracker's stride-8 trunk
    (stages 4/5 dilated, capability of reference ``resnet_atrous.py``)."""
    if atrous:
        return ResNet(stage_sizes=(3, 4, 6, 3), out_stages=out_stages,
                      strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                      dtype=dtype)
    return ResNet(stage_sizes=(3, 4, 6, 3), out_stages=out_stages,
                  dtype=dtype)


class AlexNet(nn.Module):
    """Stride-8 AlexNet trunk (capability of reference
    ``pysot/models/backbone/alexnet.py``)."""

    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        w = self.width_mult
        dims = [int(96 * w), int(256 * w), int(384 * w), int(384 * w),
                int(256 * w)]
        x = nn.Conv(dims[0], (11, 11), strides=2, padding="VALID",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=self.dtype)(x)
        x = nn.max_pool(nn.relu(x), (3, 3), strides=(2, 2))
        x = nn.Conv(dims[1], (5, 5), padding="VALID", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=self.dtype)(x)
        x = nn.max_pool(nn.relu(x), (3, 3), strides=(2, 2))
        for d, k in ((dims[2], 3), (dims[3], 3)):
            x = nn.Conv(d, (k, k), padding="VALID", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.Conv(dims[4], (3, 3), padding="VALID", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return x


class InvertedResidual(nn.Module):
    features: int
    strides: int = 1
    expand: int = 6
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        inp = x.shape[-1]
        hidden = inp * self.expand
        out = x
        if self.expand != 1:
            out = ConvBN(hidden, (1, 1), dtype=self.dtype)(out, train)
        pad = self.dilation
        out = nn.Conv(hidden, (3, 3), strides=self.strides,
                      kernel_dilation=self.dilation,
                      padding=[(pad, pad), (pad, pad)],
                      feature_group_count=hidden, use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        out = nn.relu6(out)
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        if self.strides == 1 and inp == self.features:
            out = out + x
        return out


class MobileNetV2(nn.Module):
    """MobileNetV2 trunk with dilated last stages (capability of
    reference ``pysot/models/backbone/mobile_v2.py``)."""

    width_mult: float = 1.0
    out_stages: Sequence[int] = (3, 5, 7)
    dtype: Any = jnp.float32

    # (expand, features, repeats, stride, dilation)
    config: Sequence[Tuple[int, int, int, int, int]] = (
        (1, 16, 1, 1, 1),
        (6, 24, 2, 2, 1),
        (6, 32, 3, 2, 1),
        (6, 64, 4, 1, 2),
        (6, 96, 3, 1, 2),
        (6, 160, 3, 1, 4),
        (6, 320, 1, 1, 4),
    )

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBN(int(32 * self.width_mult), (3, 3), strides=2,
                   dtype=self.dtype)(x, train)
        outputs = []
        for stage, (t, c, n, s, d) in enumerate(self.config):
            c = int(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    c, strides=s if i == 0 else 1, expand=t, dilation=d,
                    dtype=self.dtype)(x, train)
            if (stage + 1) in self.out_stages:
                outputs.append(x)
        return outputs if len(outputs) > 1 else outputs[0]
