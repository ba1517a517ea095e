"""Concurrent spatial + channel squeeze-excitation
(reference: torchok/models/modules/blocks/scse.py:12)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SCSEModule(nn.Module):
    reduction: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        # channel SE
        c = jnp.mean(x, axis=(1, 2), keepdims=True)
        c = nn.Conv(max(1, channels // self.reduction), (1, 1), dtype=self.dtype, name="cse_fc1")(c)
        c = nn.relu(c)
        c = nn.Conv(channels, (1, 1), dtype=self.dtype, name="cse_fc2")(c)
        cse = x * nn.sigmoid(c)
        # spatial SE
        s = nn.Conv(1, (1, 1), dtype=self.dtype, name="sse_conv")(x)
        sse = x * nn.sigmoid(s)
        return cse + sse
