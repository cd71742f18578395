"""Feature Pyramid Network.

Pyramid neck for the GTR-style detector (the inference stack whose
predictions the evaluator consumes; BASELINE.json north star).  Standard
top-down FPN with lateral 1x1s and output 3x3s, NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    features: int = 256
    num_extra_levels: int = 1  # P6 via stride-2 conv (RetinaNet-style)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]):
        laterals = [
            nn.Conv(self.features, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        # Top-down pathway: upsample (nearest) + add.
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(
                laterals[i + 1], laterals[i].shape, method="nearest")
            laterals[i] = laterals[i] + up
        outs = [
            nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype, name=f"post_{i}")(x)
            for i, x in enumerate(laterals)
        ]
        x = outs[-1]
        for j in range(self.num_extra_levels):
            x = nn.Conv(self.features, (3, 3), strides=2, padding="SAME",
                        dtype=self.dtype, name=f"extra_{j}")(x)
            outs.append(x)
        return outs
