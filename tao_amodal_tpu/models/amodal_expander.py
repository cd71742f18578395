"""Amodal Expander: visible box -> amodal box regression head.

The TAO-Amodal method's core module (the reference repo points to the
companion Amodal-Expander training stack, ``README.md:99``; its
inference output is exactly the prediction JSON schema our evaluator
consumes).  Operates on cached RoI features + the visible (modal) box
and regresses the amodal extent, which may leave the frame
(out-of-frame boxes get ``visibility`` / OOF handling downstream).

Design: a small MLP over [roi_feature, box geometry embedding] emitting
(dx, dy, dw, dh) deltas applied in the visible box's frame — pure
matmul work, batched over all detections of a whole clip at once.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class AmodalExpander(nn.Module):
    hidden: int = 512
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_features, boxes, image_hw=None):
        """
        Args:
          roi_features: ``[..., F]`` pooled features per detection.
          boxes: ``[..., 4]`` visible boxes, xyxy.
          image_hw: optional (h, w) for normalized geometry features.

        Returns:
          amodal ``[..., 4]`` xyxy boxes (can exceed image bounds) and
          the raw deltas.
        """
        x0, y0, x1, y1 = (boxes[..., i] for i in range(4))
        w = jnp.maximum(x1 - x0, 1e-3)
        h = jnp.maximum(y1 - y0, 1e-3)
        if image_hw is not None:
            ih, iw = image_hw
            geom = jnp.stack([x0 / iw, y0 / ih, x1 / iw, y1 / ih,
                              w / iw, h / ih], axis=-1)
        else:
            geom = jnp.stack([jnp.zeros_like(w)] * 6, axis=-1)
        geom = nn.Dense(64, dtype=self.dtype, name="geom_embed")(
            geom.astype(self.dtype))

        x = jnp.concatenate([roi_features.astype(self.dtype), geom],
                            axis=-1)
        for i in range(self.num_layers):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name=f"fc{i}")(x))
        deltas = nn.Dense(4, dtype=self.dtype, name="deltas",
                          kernel_init=nn.initializers.zeros)(x)

        cx = (x0 + x1) * 0.5 + deltas[..., 0] * w
        cy = (y0 + y1) * 0.5 + deltas[..., 1] * h
        nw = w * jnp.exp(jnp.minimum(deltas[..., 2], 4.0))
        nh = h * jnp.exp(jnp.minimum(deltas[..., 3], 4.0))
        amodal = jnp.stack([cx - nw / 2, cy - nh / 2,
                            cx + nw / 2, cy + nh / 2], axis=-1)
        return amodal, deltas
