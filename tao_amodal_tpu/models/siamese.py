"""Siamese RPN tracker model (SiamRPN++/SiamMask capability).

Capability-parity rebuild of the reference ``ModelBuilder``
(``pysot/models/model_builder.py``) + its necks/heads
(``pysot/models/{neck,head}/``) as one functional flax module:

  backbone (multi-stage) -> AdjustLayer necks (1x1 conv + center crop)
  -> per-level depthwise-xcorr RPN heads (cls + loc) -> learned
  weighted fusion; optional mask head + refine head (SiamMask).

TPU-first differences from the reference:
  * template/search pass through the SAME apply function — inference
    keeps the cached template features in a state pytree instead of
    object attributes, so the per-frame step jits into one XLA program;
  * NHWC + bfloat16-ready; xcorr is a grouped conv on the MXU
    (:mod:`tao_amodal_tpu.ops.xcorr`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tao_amodal_tpu.models.backbones import resnet50
from tao_amodal_tpu.ops.xcorr import xcorr_depthwise


def _center_crop(x, size):
    """Crop spatial center to ``size`` (reference AdjustLayer crops
    templates larger than 7x7; ``pysot/models/neck/neck.py``)."""
    h = x.shape[1]
    if h <= size:
        return x
    lo = (h - size) // 2
    return x[:, lo:lo + size, lo:lo + size, :]


class AdjustLayer(nn.Module):
    """1x1 conv + BN channel adapter, center-cropping big templates."""

    features: int = 256
    crop_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False, crop=False):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=self.dtype)(x)
        if crop:  # template branch: keep the central context
            x = _center_crop(x, self.crop_size)
        return x


class DepthwiseRPNHead(nn.Module):
    """cls+loc head over a depthwise correlation map.

    Capability of reference ``DepthwiseRPN`` (``pysot/models/head/
    rpn.py``): separate conv towers embed template and search, a
    depthwise xcorr joins them, and a small conv head predicts
    2k scores / 4k box deltas per anchor.
    """

    anchor_num: int = 5
    features: int = 256
    dtype: Any = jnp.float32

    def _tower(self, x, train, name):
        x = nn.Conv(self.features, (3, 3), padding="VALID", use_bias=False,
                    dtype=self.dtype, name=f"{name}_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name=f"{name}_bn")(x)
        return nn.relu(x)

    def _head(self, x, out_ch, train, name):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name=f"{name}_conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name=f"{name}_bn")(x)
        x = nn.relu(x)
        return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                       name=f"{name}_out")(x)

    @nn.compact
    def __call__(self, zf, xf, train=False):
        z_cls = self._tower(zf, train, "z_cls")
        x_cls = self._tower(xf, train, "x_cls")
        z_loc = self._tower(zf, train, "z_loc")
        x_loc = self._tower(xf, train, "x_loc")
        cls = self._head(xcorr_depthwise(x_cls, z_cls),
                         2 * self.anchor_num, train, "cls")
        loc = self._head(xcorr_depthwise(x_loc, z_loc),
                         4 * self.anchor_num, train, "loc")
        return cls, loc


class MaskHead(nn.Module):
    """SiamMask-style mask head: depthwise xcorr -> per-location mask
    logits (capability of reference ``pysot/models/head/mask.py``)."""

    mask_size: int = 63
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, zf, xf, train=False):
        corr = xcorr_depthwise(xf, zf)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype)(corr)
        x = nn.relu(x)
        mask = nn.Conv(self.mask_size * self.mask_size, (1, 1),
                       dtype=self.dtype)(x)
        return mask, corr


class RefineHead(nn.Module):
    """SiamMask refine module: upsample the selected location's mask
    embedding through skip connections from shallow search features
    (capability of reference ``pysot/models/head/mask.py`` Refine).

    The reference indexes one spatial position (``mask_refine(pos)``);
    here the position is a traced index so refinement stays inside
    jit.
    """

    out_size: int = 127
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, corr_feature, pos_yx):
        """corr_feature ``[B, H, W, C]``; pos_yx ``[B, 2]`` int."""
        B, H, W, C = corr_feature.shape
        idx = pos_yx[:, 0] * W + pos_yx[:, 1]
        flat = corr_feature.reshape(B, H * W, C)
        picked = jnp.take_along_axis(
            flat, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        x = picked[:, None, None, :]  # [B, 1, 1, C]
        size = 1
        feats = C
        while size < self.out_size:
            size = min(size * 4, self.out_size + 1)
            feats = max(feats // 2, 16)
            x = jax.image.resize(
                x, (B, size, size, x.shape[-1]), method="nearest")
            x = nn.Conv(feats, (3, 3), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.relu(x)
        logits = nn.Conv(1, (3, 3), padding="SAME",
                         dtype=self.dtype)(x)
        return jax.image.resize(
            logits, (B, self.out_size, self.out_size, 1),
            method="linear")[..., 0]


class SiameseTracker(nn.Module):
    """Full Siamese model; one apply with a ``mode`` switch.

    modes:
      * ``template``: image -> adjusted template features (list).
      * ``track``: (cached template feats, search image) -> cls/loc
        (+ mask if enabled).
      * ``train``: (template batch, search batch) -> raw outputs for the
        loss (see ``tao_amodal_tpu/train/siamese_loss.py``).
    """

    anchor_num: int = 5
    features: int = 256
    num_levels: int = 3
    with_mask: bool = False
    with_refine: bool = False
    mask_output_size: int = 127
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = resnet50(out_stages=(2, 3, 4), atrous=True,
                                 dtype=self.dtype)
        self.necks = [AdjustLayer(self.features, dtype=self.dtype)
                      for _ in range(self.num_levels)]
        self.heads = [DepthwiseRPNHead(self.anchor_num, self.features,
                                       dtype=self.dtype)
                      for _ in range(self.num_levels)]
        # Learned softmax-normalized fusion weights (reference
        # MultiRPN's cls_weight/loc_weight).
        self.cls_weight = self.param(
            "cls_weight", nn.initializers.ones, (self.num_levels,))
        self.loc_weight = self.param(
            "loc_weight", nn.initializers.ones, (self.num_levels,))
        if self.with_mask:
            self.mask_head = MaskHead(dtype=self.dtype)
        if self.with_refine:
            self.refine_head = RefineHead(
                out_size=self.mask_output_size, dtype=self.dtype)

    def extract(self, img, train=False, is_template=False):
        feats = self.backbone(img, train=train)
        if not isinstance(feats, (list, tuple)):
            feats = [feats]
        return [neck(f, train=train, crop=is_template)
                for neck, f in zip(self.necks, feats)]

    def fuse(self, outs, weights):
        w = nn.softmax(weights)
        return sum(o * w[i] for i, o in enumerate(outs))

    def __call__(self, template=None, search=None, zf=None, mode="track",
                 train=False):
        if mode == "template":
            return self.extract(template, train=train, is_template=True)
        if zf is None:
            zf = self.extract(template, train=train, is_template=True)
        xf = self.extract(search, train=train)
        cls_outs, loc_outs = [], []
        for head, z, x in zip(self.heads, zf, xf):
            c, l = head(z, x, train=train)
            cls_outs.append(c)
            loc_outs.append(l)
        cls = self.fuse(cls_outs, self.cls_weight)
        loc = self.fuse(loc_outs, self.loc_weight)
        out = {"cls": cls, "loc": loc}
        if self.with_mask:
            mask, corr = self.mask_head(zf[-1], xf[-1], train=train)
            out["mask"] = mask
            out["mask_corr"] = corr
        return out

    def full_init(self, template, search):
        """Initialization helper touching EVERY submodule (flax only
        creates params for executed modules; the refine head is not on
        the ``train`` path, so plain init would miss it)."""
        out = self(template=template, search=search, mode="train",
                   train=True)
        if self.with_refine:
            pos = jnp.zeros((out["mask_corr"].shape[0], 2), jnp.int32)
            out["refined"] = self.refine(out["mask_corr"], pos)
        return out

    def refine(self, corr_feature, pos_yx):
        """Refined mask logits at one response position (reference
        ``model.mask_refine(pos)``, used by SiamMaskTracker).

        Args: corr_feature ``[B, H, W, C]``, pos_yx ``[B, 2]`` int.
        Returns ``[B, out, out]`` logits.
        """
        return self.refine_head(corr_feature, pos_yx)
