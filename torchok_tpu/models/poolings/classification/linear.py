"""Pooling + linear projection to an embedding dim
(reference: torchok/models/poolings/classification/linear.py:8-25)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import POOLINGS
from torchok_tpu.models.base import BaseModel
from torchok_tpu.models.poolings.classification.pooling import Pooling


@POOLINGS.register_class
class PoolingLinear(BaseModel):
    in_channels: int = 0
    out_channels: int = 512  # YAML param name parity (reference linear.py:8)
    pooling_type: str = "avg"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Pooling(in_channels=self.in_channels, pooling_type=self.pooling_type,
                    name="pooling")(x, train)
        x = nn.Dense(self.out_channels, use_bias=self.use_bias, dtype=self.dtype,
                     name="fc")(x)
        return x
